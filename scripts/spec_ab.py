"""A/B: single-stream speculative decoding on the real chip (VERDICT r4 #1).

Arms (all 7B Q4_K_M, end-to-end through the engine):
  - baseline: plain multistep ds=64 (the r4 single-stream config)
  - pld(gamma, R): PromptLookupPipeline with the ON-DEVICE greedy spec loop
    (run_spec_multi) — R rounds of up-to-(gamma+1) tokens per dispatch
  - prompts: "rand" (the bench's random 64-token prompt — acceptance comes
    only from the model's own emergent repetition) and "rep" (a period-8
    repeated pattern — the workload prompt-lookup is built for: extraction/
    code-edit-style repetitive contexts)

Reports tok/s + measured acceptance (spec_accepted/spec_proposed) and mean
accepted-per-round. Run: python scripts/spec_ab.py [gamma_list]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

MAXLEN = 64


def _prompts():
    rand = list(np.random.default_rng(1).integers(1, 30000, size=64))
    pat = list(np.random.default_rng(3).integers(1, 30000, size=8))
    rep = (pat * 8)[:64]
    return {"rand": rand, "rep": rep}


def _measure_eng(eng, prompt, reps=3, n_requests=1):
    import bench as driver_bench

    rates = []
    stats = (0, 0)
    for _ in range(reps):
        from mistralrs_tpu.engine.engine import GenerationRequest
        from mistralrs_tpu.engine.sampler import SamplingParams

        groups = [eng.add_request(GenerationRequest(
            list(prompt), SamplingParams(max_len=MAXLEN)))
            for _ in range(n_requests)]
        rates.append(driver_bench._decode_rate(eng, groups))
        seqs = [s for g in groups for s in g.seqs]
        stats = (stats[0] + sum(s.spec_proposed for s in seqs),
                 stats[1] + sum(s.spec_accepted for s in seqs))
    return sorted(rates)[len(rates) // 2], stats


def _base_rate(prompt):
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
    pc = PipelineConfig(page_size=16, num_pages=256, max_seqs=2,
                        max_model_len=2048, prefill_buckets=(64,),
                        decode_steps=64)
    eng = Engine(TextPipeline(cfg, params, make_rope(cfg, 2048), pc),
                 eos_token_ids=set(), prefix_cache=False)
    eng.generate(prompt, SamplingParams(max_len=8))  # compile
    r, _ = _measure_eng(eng, prompt)
    del eng
    return r


def _pld_rate(prompt, gamma, rounds, n_requests=1, max_seqs=2):
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.speculative import PromptLookupPipeline
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
    pc = PipelineConfig(page_size=16, num_pages=max(256, n_requests * 16),
                        max_seqs=max_seqs, max_model_len=2048,
                        prefill_buckets=(64,))
    pld = PromptLookupPipeline(
        TextPipeline(cfg, params, make_rope(cfg, 2048), pc),
        gamma=gamma, spec_rounds=rounds)
    eng = Engine(pld, eos_token_ids=set(), prefix_cache=False)
    eng.generate(prompt, SamplingParams(max_len=8))  # compile
    r, (prop, acc) = _measure_eng(eng, prompt, n_requests=n_requests)
    del eng
    return r, prop, acc


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    gammas = ([int(g) for g in sys.argv[1].split(",")]
              if len(sys.argv) > 1 else [3, 4, 7])
    prompts = _prompts()
    for name, p in prompts.items():
        t0 = time.time()
        base = _base_rate(p)
        print(f"[{name}] baseline ds=64: {base:7.2f} tok/s "
              f"({time.time()-t0:.0f}s)", flush=True)
    for g in gammas:
        rounds = -(-MAXLEN // (g + 1))
        for name, p in prompts.items():
            t0 = time.time()
            try:
                r, prop, acc = _pld_rate(p, g, rounds)
                a = acc / prop if prop else 0.0
                print(f"[{name}] pld g={g} R={rounds}: {r:7.2f} tok/s  "
                      f"acc={a:.2f} ({acc}/{prop}) "
                      f"({time.time()-t0:.0f}s)", flush=True)
            except Exception as e:
                print(f"[{name}] pld g={g}: FAILED {type(e).__name__}: {e}",
                      flush=True)
    # batched arm: does PLD also lift batch-16 throughput?
    for name, p in prompts.items():
        t0 = time.time()
        try:
            r, prop, acc = _pld_rate(p, 4, 10, n_requests=16, max_seqs=16)
            a = acc / prop if prop else 0.0
            print(f"[{name}] pld-b16 g=4 R=10: {r:7.2f} tok/s  "
                  f"acc={a:.2f} ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"[{name}] pld-b16: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
