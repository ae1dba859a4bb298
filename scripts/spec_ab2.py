"""Follow-up spec sweep (spec_ab round 1 found g=3 R=16 best: 98.8-99.5
tok/s vs 59.3-59.5 baseline, acc=1.00 on both prompts).

Open questions this sweep answers:
  - row-tile hypothesis: B=2 x width4 = one 8-row MXU tile beat width5/8
    (2 tiles). Does max_seqs=1 x width8 (= one tile, 8 tok/round) win?
  - dispatch amortization: more rounds per dispatch (R=32 at max_len 128,
    R=64 at max_len 256) under the 400-800 ms tunnel fog.
  - small gammas: g=2 (width 3 -> 6 rows) vs g=3.

Run: python scripts/spec_ab2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def _pld(prompt, gamma, rounds, max_seqs, max_len, reps=3):
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.speculative import PromptLookupPipeline
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
    pc = PipelineConfig(page_size=16, num_pages=256, max_seqs=max_seqs,
                        max_model_len=2048, prefill_buckets=(64,))
    pld = PromptLookupPipeline(
        TextPipeline(cfg, params, make_rope(cfg, 2048), pc),
        gamma=gamma, spec_rounds=rounds)
    eng = Engine(pld, eos_token_ids=set(), prefix_cache=False)
    eng.generate(prompt, SamplingParams(max_len=8))  # compile
    rates, prop, acc = [], 0, 0
    for _ in range(reps):
        g = eng.add_request(GenerationRequest(
            list(prompt), SamplingParams(max_len=max_len)))
        rates.append(driver_bench._decode_rate(eng, [g]))
        for s in g.seqs:
            prop += s.spec_proposed
            acc += s.spec_accepted
    del eng, pld
    return sorted(rates)[len(rates) // 2], (acc / prop if prop else 0.0)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    prompt = list(np.random.default_rng(1).integers(1, 30000, size=64))
    arms = [
        # (gamma, rounds, max_seqs, max_len)
        (3, 16, 2, 64),    # round-1 winner (repeat/anchor)
        (2, 22, 2, 66),    # narrower verify, 6 rows
        (3, 32, 2, 128),   # 2x dispatch amortization
        (3, 64, 2, 256),   # 4x
        (7, 8, 1, 64),     # one 8-row tile at B=1, 8 tok/round
        (7, 32, 1, 256),   # + amortization
        (15, 16, 1, 256),  # 16-row verify at B=1, 16 tok/round
    ]
    for g, r, ms, ml in arms:
        t0 = time.time()
        try:
            rate, a = _pld(prompt, g, r, ms, ml)
            print(f"pld g={g} R={r} B={ms} len={ml}: {rate:7.2f} tok/s "
                  f"acc={a:.2f} ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"pld g={g} R={r} B={ms}: FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
