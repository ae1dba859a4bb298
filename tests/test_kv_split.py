"""Split KV pool (VERDICT r4 #6): per-scan-group pool arrays must be a pure
layout change — identical serving output, identical page-op semantics —
while keeping every single array under the compile-helper size limit."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.loader import make_rope, split_oversized_groups
from mistralrs_tpu.ops.paged_attention import (
    PagedKVCache,
    copy_pages,
    resplit_cache,
    swap_in_pages,
    swap_out_pages,
)
from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline


def _model():
    from tests.test_superscan import _mixed_model

    return _mixed_model()  # 9 layers, 6 scan groups (mixed q4k/q6k down)


def _generate(cfg, params, split, kv_quant=False, bytes_limit=None):
    if split is not None:
        os.environ["MISTRALRS_KV_SPLIT"] = split
    if bytes_limit is not None:
        os.environ["MISTRALRS_KV_SPLIT_BYTES"] = str(bytes_limit)
    try:
        pipe = TextPipeline(
            cfg, params, make_rope(cfg),
            PipelineConfig(page_size=4, num_pages=64, max_seqs=2,
                           max_model_len=128, prefill_buckets=(8, 16),
                           dtype=jnp.float32, kv_quant=kv_quant))
        eng = Engine(pipe, eos_token_ids=set())
        prompt = np.random.default_rng(5).integers(3, 250, size=9).tolist()
        toks, _ = eng.generate(prompt, SamplingParams(max_len=8))
        return toks, pipe
    finally:
        os.environ.pop("MISTRALRS_KV_SPLIT", None)
        os.environ.pop("MISTRALRS_KV_SPLIT_BYTES", None)


def test_split_engine_tokens_match():
    cfg, params = _model()
    want, _ = _generate(cfg, params, "0")  # pinned OFF (split defaults ON)
    got, pipe = _generate(cfg, params, "1")
    assert pipe.cache.is_split
    assert tuple(pipe.cache.splits) == tuple(pipe.params.group_sizes)
    assert got == want


def test_split_engine_tokens_match_int8_kv():
    cfg, params = _model()
    want, _ = _generate(cfg, params, "0", kv_quant=True)
    got, pipe = _generate(cfg, params, "1", kv_quant=True)
    assert pipe.cache.is_split and pipe.cache.quantized
    assert got == want


def test_auto_split_subdivides_oversized_groups():
    """A tiny bytes limit forces the auto gate AND sub-group splitting of
    the largest scan groups; output must still be identical."""
    cfg, params = _model()
    want, _ = _generate(cfg, params, "0")
    got, pipe = _generate(cfg, params, "auto", bytes_limit=1)
    assert pipe.cache.is_split
    assert max(pipe.params.group_sizes) == 1  # every group subdivided
    assert sum(pipe.params.group_sizes) == cfg.num_layers
    assert got == want


def test_split_oversized_groups_structure():
    cfg, params = _model()
    sp = split_oversized_groups(params, 1)
    assert all(s == 1 for s in sp.group_sizes)
    assert sum(sp.group_sizes) == sum(params.group_sizes)
    # no-op path
    assert split_oversized_groups(params, 99) is params


def test_split_page_ops_match_unsplit():
    """copy/swap/resplit on a split pool must match the single-pool ops."""
    L, P, ps, H, D = 5, 8, 4, 2, 8
    base = PagedKVCache.create(L, P, ps, H, D, jnp.float32)
    rng = np.random.default_rng(0)
    base = PagedKVCache(
        k=jnp.asarray(rng.standard_normal(base.k.shape), jnp.float32),
        v=jnp.asarray(rng.standard_normal(base.v.shape), jnp.float32),
        head_major=False)
    split = resplit_cache(base, (2, 1, 2))
    assert split.is_split and len(split.k) == 3

    a = copy_pages(base, [1, 3], [2, 5])
    b = resplit_cache(copy_pages(split, [1, 3], [2, 5]), None)
    np.testing.assert_array_equal(np.asarray(a.k), np.asarray(b.k))
    np.testing.assert_array_equal(np.asarray(a.v), np.asarray(b.v))

    ha = swap_out_pages(base, [2, 4])
    hb = swap_out_pages(split, [2, 4])
    for x, y in zip(ha, hb):
        np.testing.assert_array_equal(x, y)

    sa = swap_in_pages(base, ha, [6, 7])
    sb = resplit_cache(swap_in_pages(split, hb, [6, 7]), None)
    np.testing.assert_array_equal(np.asarray(sa.k), np.asarray(sb.k))

    # resplit roundtrip preserves content
    rt = resplit_cache(resplit_cache(split, (1, 1, 1, 1, 1)), None)
    np.testing.assert_array_equal(np.asarray(rt.k), np.asarray(base.k))


def test_split_with_re_isq_resplits():
    """re_isq regroups (all layers become uniform) — the split pool must
    re-partition to the new group structure and keep serving."""
    cfg, params = _model()
    _, pipe = _generate(cfg, params, "1")
    assert pipe.cache.is_split
    eng = Engine(pipe, eos_token_ids=set())
    pipe.re_isq("Q4_K")
    # regrouped: uniform kinds -> fewer groups; partition must match
    if getattr(pipe.cache, "is_split", False):
        assert tuple(pipe.cache.splits) == tuple(pipe.params.group_sizes)
    prompt = np.random.default_rng(5).integers(3, 250, size=9).tolist()
    toks, _ = eng.generate(prompt, SamplingParams(max_len=6))
    assert len(toks) == 6


def test_split_composes_with_superscan():
    """Split pool + superscan list-groups: per-super-group parts feed
    super_scan directly; tokens identical to the unsplit engine."""
    cfg, params = _model()
    want, _ = _generate(cfg, params, "0")
    os.environ["MISTRALRS_SUPERSCAN"] = "1"
    try:
        got, pipe = _generate(cfg, params, "1")
    finally:
        os.environ.pop("MISTRALRS_SUPERSCAN", None)
    assert pipe.cache.is_split
    assert any(isinstance(g, list) for g in pipe.params.layer_groups)
    assert got == want


def test_split_default_on():
    """r5: split is the serving default (no env) — and still token-exact."""
    cfg, params = _model()
    want, _ = _generate(cfg, params, "0")
    got, pipe = _generate(cfg, params, None)
    assert pipe.cache.is_split
    assert got == want
