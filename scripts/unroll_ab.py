"""A/B: layer-scan unroll factor + q/k partial fusion at 7B single-stream.

Measures the end-to-end engine decode rate (the only trustworthy number on
this host — see PERF.md dispatch-overhead notes) at L=32 for
MISTRALRS_SCAN_UNROLL in {1, 2, 4}. The qk partial fusion is on by default
(fuse_projections) so every arm includes it; compare against the 36.47
tok/s step_decompose L=32 baseline from the same window family.

Run: python scripts/unroll_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mistralrs_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import step_decompose

    for unroll in ("1", "2", "4"):
        os.environ["MISTRALRS_SCAN_UNROLL"] = unroll
        try:
            r = step_decompose._rate(32)
            print(f"unroll={unroll}: {r:7.2f} tok/s ({1e3 / r:6.2f} ms/tok)",
                  flush=True)
        except Exception as e:
            print(f"unroll={unroll}: FAIL {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
