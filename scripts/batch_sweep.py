"""Serving-throughput batch sweep on hardware (VERDICT r1 next-step #5).

bench.py's headline is batch 16 (the reference's --max-seqs default);
dequant cost is per-weight, so aggregate throughput should keep scaling
well past 16. This measures tokens/sec/chip at batch 32 and 64 with the
same 7B Q4_K_M model + engine config and prints one JSON line per batch
for PERF.md's throughput-optimal-batch table.

Run: python scripts/batch_sweep.py  (expects the TPU tunnel up)
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

import bench as driver_bench


def run_batch(batch: int) -> None:
    import jax.numpy as jnp

    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
    rope = make_rope(cfg, 2048)
    # pages sized for batch*(64 prompt + 48 gen) plus headroom
    pc = PipelineConfig(
        page_size=16, num_pages=max(512, batch * 10), max_seqs=batch,
        max_model_len=2048, prefill_buckets=(64,), decode_steps=16,
    )
    eng = Engine(TextPipeline(cfg, params, rope, pc), eos_token_ids=set(),
                 prefix_cache=False)
    prompt = list(np.random.default_rng(1).integers(1, 30000, size=64))
    eng.generate(prompt, SamplingParams(max_len=8))  # compile
    warm = [eng.add_request(GenerationRequest(list(prompt), SamplingParams(max_len=4)))
            for _ in range(2)]
    while not all(g.all_done() for g in warm):
        eng.step()
    serving, ttft_p50 = driver_bench._measure(
        eng, prompt, n_requests=batch, max_len=48, reps=3)
    print(json.dumps({
        "metric": f"mistral7b_q4km_decode_tok_s_per_chip_batch{batch}",
        "value": round(serving, 2),
        "unit": "tokens/sec",
        "vs_baseline": round(serving / 131.0, 3),
        "p50_ttft_ms": round(ttft_p50 * 1000, 1),
    }), flush=True)


if __name__ == "__main__":
    batches = [int(b) for b in (sys.argv[1:] or ["32", "64"])]
    for b in batches:
        run_batch(b)
