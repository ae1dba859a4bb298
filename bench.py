"""Benchmark entry point (driver contract): prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}.

Metric: single-stream decode tokens/sec on the Mistral-7B architecture on one
TPU chip — comparable to the reference's headline `mistralrs-bench` tg number
(README.md:192: 131 T/s on A100, mistral-7b Q4_K_M, PagedAttention).

Round-1 method: the full 7B in bf16 (14.5 GB) exceeds one v5e chip's HBM, so
we time decode steps at two reduced depths (16 and 8 layers — the scanned
stack makes per-layer cost uniform), fit t(L) = a + b*L, and report the
extrapolated t(32). This is an honest bf16 proxy until the fused Q4_K
dequant-GEMM path (the real configuration) replaces it.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _time_decode(num_layers: int, steps: int = 32) -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_params
    from mistralrs_tpu.models.config import ModelConfig
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg = ModelConfig(
        arch="mistral", vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=num_layers, num_heads=32, num_kv_heads=8, head_dim=128,
        max_position_embeddings=4096, sliding_window=4096, sliding_window_pattern="all",
    )
    params = _build_params(cfg, jnp.bfloat16)
    pc = PipelineConfig(page_size=16, num_pages=144, max_seqs=1, max_model_len=2048)
    pipe = TextPipeline(cfg, params, make_rope(cfg, 4096), pc)

    B = 1
    MP = pipe.max_pages_per_seq
    ids = jnp.ones((B, 1), jnp.int32)
    positions = jnp.full((B, 1), 64, jnp.int32)
    slot_mapping = jnp.asarray([[16 + 64]], jnp.int32)
    block_tables = jnp.tile(jnp.arange(1, MP + 1, dtype=jnp.int32)[None], (B, 1)) % pc.num_pages
    kv_lens = jnp.full((B,), 65, jnp.int32)
    active = jnp.ones((B,), jnp.float32)
    last_idx = jnp.zeros((B,), jnp.int32)

    def step():
        logits, pipe.cache = pipe._step_fn(
            pipe.params, pipe.cache, ids, positions, slot_mapping,
            block_tables, kv_lens, active, last_idx,
        )
        return logits

    step().block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        out = step()
    out.block_until_ready()
    return (time.perf_counter() - t0) / steps


def main():
    t16 = _time_decode(16)
    t8 = _time_decode(8)
    per_layer = (t16 - t8) / 8.0
    fixed = t8 - 8 * per_layer
    t32 = fixed + 32 * per_layer
    tok_s = 1.0 / t32
    baseline = 131.0  # reference A100 mistral-7b Q4_K_M tg T/s (README.md:192)
    print(json.dumps({
        "metric": "mistral7b_bf16_decode_tok_s_per_chip_extrapolated",
        "value": round(tok_s, 2),
        "unit": "tokens/sec",
        "vs_baseline": round(tok_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
