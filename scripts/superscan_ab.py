"""A/B: MISTRALRS_SUPERSCAN on the real Q4_K_M mix (gate for the default).

group_ab measured structure fragmentation at ~8% end-to-end (uniform arm
won 1.08x with +9% bytes); this measures the actual super-block scan
implementation: same model, env off vs on, single-stream and batch-16.

Run: python scripts/superscan_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def _rate(superscan: bool, batch: int, inline: bool = False,
          splice: bool = False, stacked: bool = False) -> float:
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    os.environ["MISTRALRS_SUPERSCAN"] = "1" if superscan else "0"
    if inline:
        os.environ["MISTRALRS_INLINE_GROUPS"] = "1"
    if splice:
        os.environ["MISTRALRS_KV_SPLICE"] = "1"
    if stacked:
        os.environ["MISTRALRS_STACKED_KERNELS"] = "1"
    try:
        cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
        pc = PipelineConfig(page_size=16, num_pages=64 + batch * 12,
                            max_seqs=max(2, batch), max_model_len=2048,
                            prefill_buckets=(64,), decode_steps=16)
        eng = Engine(TextPipeline(cfg, params, make_rope(cfg, 2048), pc),
                     eos_token_ids=set(), prefix_cache=False)
        if superscan:
            assert any(isinstance(g, list)
                       for g in eng.pipeline.params.layer_groups), \
                "superscan did not engage"
        prompt = list(np.random.default_rng(1).integers(1, 30000, size=64))
        eng.generate(prompt, SamplingParams(max_len=8))  # compile
        rates = [driver_bench._measure(eng, prompt, n_requests=batch,
                                       max_len=48 if batch > 1 else 64,
                                       reps=1)[0] for _ in range(3)]
        del eng
        return sorted(rates)[1]
    finally:
        os.environ.pop("MISTRALRS_SUPERSCAN", None)
        os.environ.pop("MISTRALRS_INLINE_GROUPS", None)
        os.environ.pop("MISTRALRS_KV_SPLICE", None)
        os.environ.pop("MISTRALRS_STACKED_KERNELS", None)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # stacked defaults are ON now; arms measure superscan on top
    arms = [("defaults   ", dict(superscan=False)),
            ("+superscan ", dict(superscan=True))]
    for batch in (1, 16):
        for name, kw in arms:
            try:
                r = _rate(batch=batch, **kw)
                print(f"batch={batch:2d} {name}: {r:7.2f} tok/s", flush=True)
            except Exception as e:
                print(f"batch={batch:2d} {name}: FAIL {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
