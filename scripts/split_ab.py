"""A/B: split KV pool on the serving decode paths (r5).

The spec-round trace (profile_spec, 22:40 UTC) shows per-group KV pool
slice-starts (bf16[5,256,16,8,128] -> [2,...]) and group-boundary h
copy-starts inside every round — the split pool replaces the slices with
whole per-group arrays. Arms (7B Q4_K_M):
  plain ds=64 single-stream   split=0 vs 1
  pld g=3 R=16 single-stream  split=0 vs 1
  batch-16 decode             split=0 vs 1

Run: python scripts/split_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def _engine(split, spec, batch):
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    os.environ["MISTRALRS_KV_SPLIT"] = "1" if split else "0"
    try:
        cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
        pc = PipelineConfig(page_size=16,
                            num_pages=max(256, batch * 16),
                            max_seqs=batch if batch > 1 else 2,
                            max_model_len=2048, prefill_buckets=(64,),
                            decode_steps=64 if batch == 1 else 16)
        pipe = TextPipeline(cfg, params, make_rope(cfg, 2048), pc)
        if spec:
            from mistralrs_tpu.pipeline.speculative import PromptLookupPipeline

            pipe = PromptLookupPipeline(pipe, gamma=3, spec_rounds=16)
        return Engine(pipe, eos_token_ids=set(), prefix_cache=False)
    finally:
        os.environ.pop("MISTRALRS_KV_SPLIT", None)


def _rate(split, spec=False, batch=1, reps=3):
    import bench as driver_bench
    from mistralrs_tpu.engine.engine import GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams

    eng = _engine(split, spec, batch)
    prompt = list(np.random.default_rng(1).integers(1, 30000, size=64))
    eng.generate(prompt, SamplingParams(max_len=8))  # compile
    rates = []
    for _ in range(reps):
        gs = [eng.add_request(GenerationRequest(
            list(prompt), SamplingParams(max_len=64 if batch == 1 else 48)))
            for _ in range(max(1, batch))]
        rates.append(driver_bench._decode_rate(eng, gs))
    del eng
    return sorted(rates)[len(rates) // 2]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for name, kw in [("plain-ss ", dict()),
                     ("pld-g3R16", dict(spec=True)),
                     ("batch16  ", dict(batch=16))]:
        for split in (0, 1):
            t0 = time.time()
            try:
                r = _rate(split, **kw)
                print(f"{name} split={split}: {r:7.2f} tok/s "
                      f"({time.time()-t0:.0f}s)", flush=True)
            except Exception as e:
                print(f"{name} split={split}: FAIL {type(e).__name__}: "
                      f"{str(e)[:130]}", flush=True)


if __name__ == "__main__":
    main()
