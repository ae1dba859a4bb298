"""Convention parity for the staged ragged-paged-attention adoption
(ops/ragged_attention.py): the upstream kernel's reference implementation
must agree with this repo's sdpa + mask conventions through our adapters
(combined even/odd KV interleave, flattened cu_q_lens queries, window edge,
softcap-after-scale order, GQA). On-chip kernel test:
tests/test_tpu_paths.py::test_ragged_kernel_on_chip."""

import jax.numpy as jnp
import numpy as np
import pytest

from mistralrs_tpu.ops import attention as attn_ops
from mistralrs_tpu.ops.ragged_attention import combine_kv, flatten_queries


@pytest.mark.parametrize("window,softcap", [(None, None), (16, None),
                                            (None, 30.0), (16, 30.0)])
def test_ref_kernel_matches_sdpa_mixed_batch(window, softcap):
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ref_ragged_paged_attention,
    )

    rng = np.random.default_rng(7)
    Hq, Hkv, D, page = 4, 2, 16, 4
    # mixed batch: decode (1 q tok), first chunk (8), continuation (4)
    q_lens = [1, 8, 4]
    kv_lens = [20, 8, 30]
    P = 64
    pages_per_seq = max(-(-kv // page) for kv in kv_lens)
    T = max(q_lens)
    B = len(q_lens)

    # head-major per-layer pools like PagedKVCache: [Hkv, P, page, D]
    k_hm = jnp.asarray(rng.standard_normal((Hkv, P, page, D)), jnp.float32)
    v_hm = jnp.asarray(rng.standard_normal((Hkv, P, page, D)), jnp.float32)
    tables = np.zeros((B, pages_per_seq), np.int32)
    next_page = 1
    for i, kv in enumerate(kv_lens):
        n = -(-kv // page)
        tables[i, :n] = np.arange(next_page, next_page + n)
        next_page += n

    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.float32)
    scale = D**-0.5

    q_flat, cu = flatten_queries(q, jnp.asarray(q_lens, jnp.int32))
    got = ref_ragged_paged_attention(
        q_flat[: sum(q_lens)], combine_kv(k_hm, v_hm),
        jnp.asarray(kv_lens, jnp.int32), jnp.asarray(tables),
        cu, jnp.asarray([B], jnp.int32),
        sm_scale=scale, sliding_window=window, soft_cap=softcap,
    )
    got = np.asarray(got, np.float32)

    # per-sequence dense reference through the repo's own conventions
    off = 0
    for i in range(B):
        ql, kvl = q_lens[i], kv_lens[i]
        # gather this seq's kv from the pools via its table
        idx = tables[i, : -(-kvl // page)]
        k_seq = np.asarray(k_hm)[:, idx].transpose(1, 2, 0, 3).reshape(
            -1, Hkv, D)[:kvl]
        v_seq = np.asarray(v_hm)[:, idx].transpose(1, 2, 0, 3).reshape(
            -1, Hkv, D)[:kvl]
        bias = attn_ops.causal_mask_bias(
            ql, kvl, q_offsets=jnp.asarray([kvl - ql]), sliding_window=window)
        want = attn_ops.sdpa(
            q[i : i + 1, :ql], jnp.asarray(k_seq)[None], jnp.asarray(v_seq)[None],
            scale=scale, mask=bias, logits_softcap=softcap)
        np.testing.assert_allclose(
            got[off : off + ql], np.asarray(want)[0], rtol=2e-5, atol=2e-5,
            err_msg=f"seq {i} window={window} softcap={softcap}")
        off += ql


def test_flatten_queries_packing():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((3, 4, 2, 8)), jnp.float32)
    q_lens = jnp.asarray([1, 4, 2], jnp.int32)
    flat, cu = flatten_queries(q, q_lens)
    assert list(np.asarray(cu)) == [0, 1, 5, 7]
    np.testing.assert_array_equal(np.asarray(flat[0]), np.asarray(q[0, 0]))
    np.testing.assert_array_equal(np.asarray(flat[1:5]), np.asarray(q[1, :4]))
    np.testing.assert_array_equal(np.asarray(flat[5:7]), np.asarray(q[2, :2]))


def test_combined_pool_write_split_roundtrip():
    """write_combined_kv + split_combined: interleaved storage is exact."""
    from mistralrs_tpu.ops.ragged_attention import split_combined, write_combined_kv

    rng = np.random.default_rng(3)
    P, page, H, D, B, T = 6, 4, 2, 8, 2, 5
    pool = jnp.zeros((P, page, 2 * H, D), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    tables = np.array([[1, 2], [3, 4]], np.int32)
    pos = np.tile(np.arange(T), (B, 1))
    slots = tables[np.arange(B)[:, None], pos // page] * page + pos % page
    pool = write_combined_kv(pool, k, v, jnp.asarray(slots))
    kv, vv = split_combined(pool)
    got_k = np.asarray(kv).reshape(P * page, H, D)[slots.reshape(-1)]
    got_v = np.asarray(vv).reshape(P * page, H, D)[slots.reshape(-1)]
    np.testing.assert_array_equal(got_k, np.asarray(k).reshape(-1, H, D))
    np.testing.assert_array_equal(got_v, np.asarray(v).reshape(-1, H, D))


@pytest.mark.slow
@pytest.mark.parametrize("window", [None, 12])
def test_engine_ragged_backend_matches_default(window, monkeypatch):
    """MISTRALRS_ATTN_BACKEND=ragged end-to-end on CPU: the combined pool +
    split-view gather path must greedy-match the default backend. (On TPU
    the same branch routes through the ragged kernel —
    tests/test_tpu_paths.py::test_ragged_kernel_on_chip validates that.)"""
    import json

    import torch
    import transformers as tf

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import (
        TensorSource, make_rope, params_from_source,
    )
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    torch.manual_seed(3)
    kw = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
              num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
              max_position_embeddings=128)
    if window:
        model = tf.MistralForCausalLM(tf.MistralConfig(**kw, sliding_window=window))
    else:
        model = tf.LlamaForCausalLM(tf.LlamaConfig(**kw))
    model = model.eval().float()
    cfg = config_from_hf(json.loads(model.config.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    rope = make_rope(cfg)
    prompts = [np.random.default_rng(s).integers(3, 120, size=n).tolist()
               for s, n in ((1, 20), (2, 9))]

    def run(backend):
        if backend:
            monkeypatch.setenv("MISTRALRS_ATTN_BACKEND", backend)
        else:
            monkeypatch.delenv("MISTRALRS_ATTN_BACKEND", raising=False)
        pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2,
                            max_model_len=128, prefill_buckets=(16,),
                            dtype=jnp.float32)
        pipe = TextPipeline(cfg, params, rope, pc)
        assert pipe.kv_combined == (backend == "ragged")
        eng = Engine(pipe, eos_token_ids=set())
        return [eng.generate(p, SamplingParams(max_len=8))[0] for p in prompts]

    assert run("ragged") == run(None)


def test_combined_pool_page_ops():
    """COW copies and host swap on combined pools (single interleaved leaf)."""
    from mistralrs_tpu.ops.paged_attention import (
        PagedKVCache, copy_pages, swap_in_pages, swap_out_pages,
    )

    rng = np.random.default_rng(4)
    cache = PagedKVCache.create(1, 6, 2, 2, 8, dtype=jnp.float32, combined=True)
    assert cache.combined and cache.v is None
    pool = cache.k.at[:, 1].set(
        jnp.asarray(rng.standard_normal((1, 2, 4, 8)), jnp.float32))
    cache = PagedKVCache(k=pool, v=None)
    c2 = copy_pages(cache, [1], [4])
    np.testing.assert_array_equal(np.asarray(c2.k[:, 4]), np.asarray(c2.k[:, 1]))
    host = swap_out_pages(c2, [1])
    assert len(host) == 1
    zeroed = PagedKVCache(k=c2.k.at[:, 1].set(0), v=None)
    c3 = swap_in_pages(zeroed, host, [1])
    np.testing.assert_array_equal(np.asarray(c3.k[:, 1]), np.asarray(c2.k[:, 1]))


def test_pack_ragged_meta_padded_continuation():
    """The padded-width convention (meta.kv_lens = start + T) must be
    unwound before the kernel: a continuation chunk with n real tokens
    padded to T shifts query positions by T - n unless kv_lens is adjusted
    (was a silent wrong-attention bug on the TPU path). Validates the full
    packed call against the repo's sdpa on the same combined pool."""
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ref_ragged_paged_attention,
    )

    from mistralrs_tpu.ops.paged_attention import PagedAttnMeta
    from mistralrs_tpu.ops.ragged_attention import (
        pack_ragged_meta, split_combined, write_combined_kv,
    )

    rng = np.random.default_rng(7)
    Hq, Hkv, D, page, P = 4, 2, 16, 4, 32
    start, n, T = 12, 5, 8  # 12 cached tokens + 5 real new ones padded to 8
    B = 2  # row 1 is an inactive padding row
    pages_per_seq = 8
    tables = np.zeros((B, pages_per_seq), np.int32)
    tables[0, : -(-(start + n) // page)] = np.arange(1, 6)
    pos = np.arange(start, start + T)
    slots = np.zeros((B, T), np.int32)
    slots[0, :n] = tables[0, pos[:n] // page] * page + pos[:n] % page
    meta = PagedAttnMeta(
        positions=jnp.asarray(np.tile(pos, (B, 1))),
        slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(tables),
        # padded-width convention: start + T, NOT start + n
        kv_lens=jnp.asarray([start + T, 1], jnp.int32),
        active=jnp.asarray([1.0, 0.0]),
    )
    pool = jnp.zeros((P, page, 2 * Hkv, D), jnp.float32)
    # pre-existing context in pages 1..3 (tokens 0..start-1)
    ctx_slots = tables[0, np.arange(start) // page] * page + np.arange(start) % page
    ctx_k = jnp.asarray(rng.standard_normal((1, start, Hkv, D)), jnp.float32)
    ctx_v = jnp.asarray(rng.standard_normal((1, start, Hkv, D)), jnp.float32)
    pool = write_combined_kv(pool, ctx_k, ctx_v, jnp.asarray(ctx_slots[None]))
    # this chunk's K/V
    new_k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    new_v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    pool = write_combined_kv(pool, new_k, new_v, meta.slot_mapping)

    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.float32)
    q_flat, cu, kv_lens, num_seqs, q_lens = pack_ragged_meta(q, meta, page)
    assert list(np.asarray(q_lens)) == [n, 0]
    assert list(np.asarray(kv_lens))[0] == start + n
    assert int(np.asarray(num_seqs)[0]) == 1
    got = np.asarray(ref_ragged_paged_attention(
        q_flat[: n], pool, kv_lens, meta.block_tables, cu,
        jnp.asarray(num_seqs), sm_scale=D**-0.5), np.float32)

    # reference: dense sdpa over the gathered context with absolute offsets
    from mistralrs_tpu.ops import attention as attn_ops

    kv, vv = split_combined(pool)
    S = start + n
    flat_idx = tables[0, np.arange(S) // page] * page + np.arange(S) % page
    k_seq = np.asarray(kv).reshape(P * page, Hkv, D)[flat_idx]
    v_seq = np.asarray(vv).reshape(P * page, Hkv, D)[flat_idx]
    bias = attn_ops.causal_mask_bias(n, S, q_offsets=jnp.asarray([S - n]))
    want = np.asarray(attn_ops.sdpa(
        q[0:1, :n], jnp.asarray(k_seq)[None], jnp.asarray(v_seq)[None],
        scale=D**-0.5, mask=bias), np.float32)
    np.testing.assert_allclose(got, want[0], rtol=2e-5, atol=2e-5)
