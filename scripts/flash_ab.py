"""A/B the flash-prefill streaming dtype on hardware (VERDICT r1 weak #5).

Builds the driver bench's synthetic 7B Q4_K_M model, times batched prefill
(the pp path) with MISTRALRS_FLASH_BF16=0 vs =1 (bf16 streaming is the
default since round 2, so "unset" would be a no-op comparison), prints both
rates.
A fresh engine per setting: the env var is read at trace time, so reusing
one jitted pipeline would silently keep the first compilation.

Run: python scripts/flash_ab.py  (expects the TPU tunnel up)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def _pp_rate(flag: str) -> float:
    os.environ["MISTRALRS_FLASH_BF16"] = flag
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    # 8 layers: same per-layer flash work, 4x cheaper build/compile on this
    # 1-core host (the full-depth build blew the r2 queue's 580s cap);
    # the f32-vs-bf16 ratio is per-layer so depth cancels out
    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16, num_layers=8)
    rope = make_rope(cfg, 2048)
    pc = PipelineConfig(page_size=16, num_pages=512, max_seqs=4,
                        max_model_len=2048, prefill_buckets=(512,))
    eng = Engine(TextPipeline(cfg, params, rope, pc), eos_token_ids=set(),
                 prefix_cache=False)
    prompt = list(np.random.default_rng(1).integers(1, 30000, size=512))
    eng.generate(prompt, SamplingParams(max_len=2))  # warm/compile
    reps, toks = 3, 0
    t0 = time.time()
    for _ in range(reps):
        gs = [eng.add_request(GenerationRequest(list(prompt), SamplingParams(max_len=1)))
              for _ in range(4)]
        while not all(g.all_done() for g in gs):
            eng.step()
        toks += 4 * len(prompt)
    # axon: block_until_ready is a no-op; all_done implies host-visible tokens
    return toks / (time.time() - t0)


if __name__ == "__main__":
    f32 = _pp_rate("0")
    print(f"pp f32-stream : {f32:.0f} tok/s")
    bf16 = _pp_rate("1")
    print(f"pp bf16-stream: {bf16:.0f} tok/s  ({bf16 / f32:.2%} of f32)")
