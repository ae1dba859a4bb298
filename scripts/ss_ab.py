"""A/B: single-stream serving config — decode_steps x engine width.

The r3 step intercept (3.44 ms/tok) carries ~dispatch/decode_steps of
tunnel/host overhead, and a max_seqs=2 engine pays ~20 pad/slice ops per
layer to reach the kernels' 8-row floor (quant_matmul._pad_rows). Arms:
  (decode_steps, max_seqs) in {16, 32} x {2, 8}
measured end-to-end through the engine at L=32 7B Q4_K_M single stream
(the only trustworthy measurement on this host — PERF.md dispatch notes).

Run: python scripts/ss_ab.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def _rate(decode_steps: int, max_seqs: int) -> float:
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
    pc = PipelineConfig(page_size=16, num_pages=256, max_seqs=max_seqs,
                        max_model_len=2048, prefill_buckets=(64,),
                        decode_steps=decode_steps)
    eng = Engine(TextPipeline(cfg, params, make_rope(cfg, 2048), pc),
                 eos_token_ids=set(), prefix_cache=False)
    prompt = list(np.random.default_rng(1).integers(1, 30000, size=64))
    eng.generate(prompt, SamplingParams(max_len=8))  # compile
    rates = []
    for _ in range(3):
        rates.append(driver_bench._measure(
            eng, prompt, n_requests=1, max_len=64, reps=1)[0])
    del eng
    return sorted(rates)[1]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for ds in (16, 32, 64):
        for ms in ((2, 8) if ds != 64 else (2,)):
            try:
                t0 = time.time()
                r = _rate(ds, ms)
                print(f"decode_steps={ds} max_seqs={ms}: {r:7.2f} tok/s "
                      f"({time.time() - t0:.0f}s wall)", flush=True)
            except Exception as e:
                print(f"decode_steps={ds} max_seqs={ms}: FAIL {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
