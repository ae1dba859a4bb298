"""Decompose the single-stream decode step time end-to-end (r3).

Micro-benchmarks on this host are swamped by a per-dispatch overhead that
fluctuates 20-50 ms (PERF.md round-3 notes), so per-matmul timings can't
resolve where the 38.8 ms step goes. This measures the REAL serving path
(engine, decode_steps=16 on-device multistep => overhead amortized 16x) at
layer counts 8/16/32 of the same 7B-per-layer model:

    tok_time(L) = intercept + L * per_layer
    per_layer   = the quant-GEMV weight path (the kernel-rewrite target)
    intercept   = attention + lm_head + sampling + dispatch/16

Also reports a long-prompt arm at L=8 to size the attention share.

Run: python scripts/step_decompose.py  (expects the TPU tunnel up)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def _rate(num_layers: int, prompt_len: int = 64, batch: int = 1) -> float:
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16, num_layers=num_layers)
    pc = PipelineConfig(page_size=16, num_pages=64 + batch * 12,
                        max_seqs=max(2, batch),
                        max_model_len=2048, prefill_buckets=(64,),
                        decode_steps=16)
    eng = Engine(TextPipeline(cfg, params, make_rope(cfg, 2048), pc),
                 eos_token_ids=set(), prefix_cache=False)
    prompt = list(np.random.default_rng(1).integers(1, 30000, size=prompt_len))
    eng.generate(prompt, SamplingParams(max_len=8))  # compile
    rates = []
    for _ in range(3):
        rates.append(driver_bench._measure(
            eng, prompt, n_requests=batch, max_len=64, reps=1)[0])
    del eng
    return sorted(rates)[1]


def main():
    import jax

    # persistent compile cache (bench.py only sets this in ITS main):
    # three model sizes = 3 full compile sets; without the cache a cold run
    # blows the 590 s driver window before printing L=8 (seen r3 after the
    # int8-path flips invalidated the old cache entries)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    batch = 32 if "--batch32" in sys.argv else 1
    results = {}
    for L in (8, 16, 32):
        r = _rate(L, batch=batch)
        results[L] = batch / r
        print(f"L={L:2d} B={batch}: {r:7.2f} tok/s  "
              f"({1e3 * batch / r:6.2f} ms/step)", flush=True)
    # least-squares slope/intercept over the three points
    Ls = np.array(sorted(results), np.float64)
    ts = np.array([results[int(l)] for l in Ls]) * 1e3  # ms/step
    slope, intercept = np.polyfit(Ls, ts, 1)
    print(f"per-layer: {slope:6.3f} ms/step/layer -> 32L weights path "
          f"{slope * 32:6.2f} ms", flush=True)
    print(f"intercept: {intercept:6.2f} ms/step (attention + lm_head + "
          f"sampling + dispatch/16)", flush=True)
    if batch == 1:
        long_r = _rate(8, prompt_len=1024)
        print(f"L= 8 @1k-token prompt: {long_r:7.2f} tok/s ({1e3 / long_r:6.2f} "
              f"ms/tok; delta vs 64-tok prompt = attention span cost)",
              flush=True)


if __name__ == "__main__":
    main()
