"""A/B: scan-group fragmentation cost (r4 follow-up to step_decompose).

The real Q4_K_M mix (attn_v + use_more_bits ffn_down in Q6_K) fragments
the 32-layer stack into 17 scan groups (mostly singletons/pairs) — 17
lax.scan calls + per-group xs slicing per decode step. This measures the
end-to-end single-stream rate of the mixed model vs a UNIFORM all-Q6_K-
down variant (one structure, 2 groups). The uniform arm streams ~9% MORE
weight bytes, so if it still wins, group fragmentation is a real cost and
a super-block scan (scan over the repeating [q4,q4,q6] pattern) is
justified.

Run: python scripts/group_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def _rate(uniform: bool) -> float:
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    if uniform:
        orig = driver_bench._use_more_bits
        driver_bench._use_more_bits = lambda i, n: True
    try:
        cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
    finally:
        if uniform:
            driver_bench._use_more_bits = orig
    print(f"  groups: {params.group_sizes}", flush=True)
    pc = PipelineConfig(page_size=16, num_pages=256, max_seqs=2,
                        max_model_len=2048, prefill_buckets=(64,),
                        decode_steps=16)
    eng = Engine(TextPipeline(cfg, params, make_rope(cfg, 2048), pc),
                 eos_token_ids=set(), prefix_cache=False)
    prompt = list(np.random.default_rng(1).integers(1, 30000, size=64))
    eng.generate(prompt, SamplingParams(max_len=8))  # compile
    rates = [driver_bench._measure(eng, prompt, n_requests=1, max_len=64,
                                   reps=1)[0] for _ in range(3)]
    del eng
    return sorted(rates)[1]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    mixed = _rate(False)
    print(f"mixed Q4_K_M (17 groups) : {mixed:7.2f} tok/s", flush=True)
    uni = _rate(True)
    print(f"uniform q6-down (2 groups): {uni:7.2f} tok/s  "
          f"[{uni / mixed:.3f}x, +9% weight bytes]", flush=True)


if __name__ == "__main__":
    main()
