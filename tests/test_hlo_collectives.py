"""HLO-level collective audit for the sharded decode step (VERDICT r3 #4).

The >=90% multi-chip scaling target is unmeasurable on one chip, but its
main failure mode IS checkable offline: a PartitionSpec mistake that makes
GSPMD insert per-step weight-sized all-gathers (re-sharding a parameter
every decode step destroys scaling long before ICI bandwidth matters).
This compiles the TP and EP decode steps on the virtual 8-device CPU mesh
and asserts, from the optimized HLO text:

  1. no collective's result is weight-sized (threshold: half the smallest
     projection matrix) — parameters must stay resident in their sharded
     layout;
  2. row-parallel projections DO produce all-reduces (the audit would pass
     trivially on a fully-replicated model, which is not TP).

Reference anchor: SURVEY.md §2.4 TP row — the reference has no SPMD layer;
this gate is for the genuinely new code in parallel/mesh.py.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mistralrs_tpu.parallel.mesh import make_mesh

# `f32[2,128]{1,0} all-gather(...)` / `bf16[64,128] all-reduce(...)`
_COLL_RE = re.compile(
    r"=\s*(?:\()?(\w+)\[([\d,]*)\][^=]*?"
    r"\b(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)\(")

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8}


def _collectives(hlo_text: str) -> list[tuple[str, int]]:
    """[(op_kind, result_bytes)] for every collective in the HLO."""
    out = []
    for m in _COLL_RE.finditer(hlo_text):
        dtype, dims, kind = m.group(1), m.group(2), m.group(3)
        n = int(np.prod([int(d) for d in dims.split(",")])) if dims else 1
        out.append((kind, n * _DTYPE_BYTES.get(dtype, 4)))
    return out


def _decode_hlo(cfg_kw: dict, mesh) -> tuple[str, int]:
    """Compile the sharded decode step; return (optimized HLO text,
    smallest projection weight bytes)."""
    from mistralrs_tpu.models.config import ModelConfig
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    from __graft_entry__ import _build_params

    cfg = ModelConfig(**cfg_kw)
    params = _build_params(cfg, jnp.float32)
    pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2,
                        max_model_len=64, prefill_buckets=(8,),
                        dtype=jnp.float32)
    pipe = TextPipeline(cfg, params, make_rope(cfg, 64), pc, mesh=mesh)
    B = pc.max_seqs
    MP = pipe.max_pages_per_seq
    ids = jnp.ones((B, 1), jnp.int32)
    positions = jnp.full((B, 1), 5, jnp.int32)
    slots = 4 * (1 + jnp.arange(B, dtype=jnp.int32))[:, None] + 1
    tables = jnp.tile(jnp.arange(1, MP + 1, dtype=jnp.int32)[None], (B, 1)) % pc.num_pages
    kv_lens = jnp.full((B,), 6, jnp.int32)
    active = jnp.ones((B,), jnp.float32)
    last_idx = jnp.zeros((B,), jnp.int32)
    compiled = pipe._step_fn.lower(
        pipe.params, pipe.cache, ids, positions, slots, tables, kv_lens,
        active, last_idx).compile()
    H, D, I = cfg.hidden_size, cfg.head_dim, cfg.intermediate_size
    min_w = min(H * cfg.num_kv_heads * D, H * I // max(1, cfg.num_experts or 1)) * 4
    return compiled.as_text(), min_w


_TP_CFG = dict(
    arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=8, num_kv_heads=8, head_dim=8,
    max_position_embeddings=64,
)


def test_tp_decode_step_no_weight_sized_collectives():
    mesh = make_mesh(dp=1)  # tp=8
    hlo, min_w = _decode_hlo(_TP_CFG, mesh)
    colls = _collectives(hlo)
    assert colls, "TP step compiled with no collectives at all (not TP?)"
    big = [(k, b) for k, b in colls if b > min_w // 2]
    assert not big, (
        f"weight-sized collectives in the TP decode step (threshold "
        f"{min_w // 2} B): {big} — a PartitionSpec is re-sharding a "
        f"parameter every step")
    # row-parallel o/down projections must produce all-reduces (or
    # reduce-scatters under a different strategy) — a fully-replicated
    # model would pass the size check while not being TP at all
    reduces = [k for k, _ in colls if k in ("all-reduce", "reduce-scatter")]
    assert len(reduces) >= 2, f"expected per-layer partial-sum reductions, got {colls}"


def test_ep_decode_step_no_weight_sized_collectives():
    cfg_kw = dict(
        arch="mixtral", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=8, num_kv_heads=8, head_dim=8,
        max_position_embeddings=64, num_experts=8, num_experts_per_tok=2,
    )
    mesh = make_mesh(dp=1)
    hlo, _ = _decode_hlo(cfg_kw, mesh)
    colls = _collectives(hlo)
    # expert weights are [E, H, I] sharded on E: full expert-stack bytes
    ew = 8 * 64 * 128 * 4
    big = [(k, b) for k, b in colls if b > ew // 2]
    assert not big, f"expert-stack-sized collectives in the EP step: {big}"


def test_audit_detects_weight_sized_gather():
    """Negative control: force a replicated output from a sharded weight —
    the parser/threshold machinery must flag the resulting weight-sized
    all-gather (guards the regex against HLO format drift)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(dp=1)
    w = jax.device_put(jnp.ones((64, 128), jnp.float32),
                       NamedSharding(mesh, P(None, "tp")))
    f = jax.jit(lambda a: a * 2.0,
                out_shardings=NamedSharding(mesh, P(None, None)))
    hlo = f.lower(w).compile().as_text()
    colls = _collectives(hlo)
    big = [(k, b) for k, b in colls if b >= 64 * 128 * 4]
    assert big, f"audit failed to flag the deliberate all-gather: {hlo[:2000]}"
