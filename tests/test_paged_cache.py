"""Paged KV backend vs dense slotted cache equivalence."""

import jax.numpy as jnp
import numpy as np

from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.decoder import compute_logits, decoder_forward
from mistralrs_tpu.models.loader import make_rope
from mistralrs_tpu.ops.kv_cache import AttnMeta, KVCache
from mistralrs_tpu.ops.paged_attention import PagedAttnMeta, PagedKVCache


def _tiny_cfg(**over):
    base = dict(
        arch="llama",
        vocab_size=97,
        hidden_size=32,
        intermediate_size=48,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=8,
        max_position_embeddings=64,
    )
    base.update(over)
    return ModelConfig(**base)


def _rand_params(cfg, seed=0):
    from mistralrs_tpu.models.loader import TensorSource, params_from_source

    rng = np.random.default_rng(seed)

    def t(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    sd = {
        "model.embed_tokens.weight": t(cfg.vocab_size, cfg.hidden_size),
        "model.norm.weight": t(cfg.hidden_size) + 1.0,
        "lm_head.weight": t(cfg.vocab_size, cfg.hidden_size),
    }
    H, D = cfg.hidden_size, cfg.head_dim
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        sd[f"{p}.self_attn.q_proj.weight"] = t(cfg.num_heads * D, H)
        sd[f"{p}.self_attn.k_proj.weight"] = t(cfg.num_kv_heads * D, H)
        sd[f"{p}.self_attn.v_proj.weight"] = t(cfg.num_kv_heads * D, H)
        sd[f"{p}.self_attn.o_proj.weight"] = t(H, cfg.num_heads * D)
        sd[f"{p}.mlp.gate_proj.weight"] = t(cfg.intermediate_size, H)
        sd[f"{p}.mlp.up_proj.weight"] = t(cfg.intermediate_size, H)
        sd[f"{p}.mlp.down_proj.weight"] = t(H, cfg.intermediate_size)
        sd[f"{p}.input_layernorm.weight"] = t(H) + 1.0
        sd[f"{p}.post_attention_layernorm.weight"] = t(H) + 1.0
    return params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)


def test_paged_matches_dense():
    cfg = _tiny_cfg()
    params = _rand_params(cfg)
    rope = make_rope(cfg)
    rng = np.random.default_rng(1)
    B, T = 2, 6
    ids = rng.integers(0, cfg.vocab_size, (B, T))

    # dense full-prefill
    dense_cache = KVCache.create(cfg.num_layers, B, 16, cfg.num_kv_heads, cfg.head_dim, jnp.float32)
    meta = AttnMeta(
        positions=jnp.tile(jnp.arange(T)[None], (B, 1)),
        write_pos=jnp.zeros((B,), jnp.int32),
        kv_lens=jnp.full((B,), T, jnp.int32),
        active=jnp.ones((B,)),
    )
    h_d, _ = decoder_forward(params, cfg, rope, jnp.asarray(ids), dense_cache, meta)

    # paged: page_size 4, row 0 uses pages [1,3], row 1 uses pages [2,5]
    page = 4
    pcache = PagedKVCache.create(cfg.num_layers, 8, page, cfg.num_kv_heads, cfg.head_dim, jnp.float32)
    tables = jnp.asarray([[1, 3, 0, 0], [2, 5, 0, 0]], jnp.int32)
    offs = np.arange(T)
    slots = np.stack(
        [
            np.asarray([1 * page, 1 * page + 1, 1 * page + 2, 1 * page + 3, 3 * page, 3 * page + 1]),
            np.asarray([2 * page, 2 * page + 1, 2 * page + 2, 2 * page + 3, 5 * page, 5 * page + 1]),
        ]
    )
    pmeta = PagedAttnMeta(
        positions=jnp.tile(jnp.arange(T)[None], (B, 1)),
        slot_mapping=jnp.asarray(slots, jnp.int32),
        block_tables=tables,
        kv_lens=jnp.full((B,), T, jnp.int32),
        active=jnp.ones((B,)),
    )
    h_p, pcache = decoder_forward(params, cfg, rope, jnp.asarray(ids), pcache, pmeta)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_d), rtol=1e-5, atol=1e-5)

    # decode one token on the paged cache and compare against dense decode
    meta_d = AttnMeta(
        positions=jnp.full((B, 1), T, jnp.int32),
        write_pos=jnp.full((B,), T, jnp.int32),
        kv_lens=jnp.full((B,), T + 1, jnp.int32),
        active=jnp.ones((B,)),
    )
    dense_cache2 = KVCache.create(cfg.num_layers, B, 16, cfg.num_kv_heads, cfg.head_dim, jnp.float32)
    _, dense_cache2 = decoder_forward(params, cfg, rope, jnp.asarray(ids), dense_cache2, meta)
    tok = rng.integers(0, cfg.vocab_size, (B, 1))
    h_d2, _ = decoder_forward(params, cfg, rope, jnp.asarray(tok), dense_cache2, meta_d)

    pmeta2 = PagedAttnMeta(
        positions=jnp.full((B, 1), T, jnp.int32),
        slot_mapping=jnp.asarray([[3 * page + 2], [5 * page + 2]], jnp.int32),
        block_tables=tables,
        kv_lens=jnp.full((B,), T + 1, jnp.int32),
        active=jnp.ones((B,)),
    )
    h_p2, _ = decoder_forward(params, cfg, rope, jnp.asarray(tok), pcache, pmeta2)
    np.testing.assert_allclose(np.asarray(h_p2), np.asarray(h_d2), rtol=1e-5, atol=1e-5)


def test_paged_sliding_window_matches_dense():
    cfg = _tiny_cfg(arch="mistral", sliding_window=3, sliding_window_pattern="all")
    params = _rand_params(cfg, seed=2)
    rope = make_rope(cfg)
    rng = np.random.default_rng(3)
    B, T = 1, 8
    ids = rng.integers(0, cfg.vocab_size, (B, T))

    dense_cache = KVCache.create(cfg.num_layers, B, 8, cfg.num_kv_heads, cfg.head_dim, jnp.float32)
    meta = AttnMeta(
        positions=jnp.arange(T)[None],
        write_pos=jnp.zeros((B,), jnp.int32),
        kv_lens=jnp.full((B,), T, jnp.int32),
        active=jnp.ones((B,)),
    )
    h_d, _ = decoder_forward(params, cfg, rope, jnp.asarray(ids), dense_cache, meta)

    page = 4
    pcache = PagedKVCache.create(cfg.num_layers, 4, page, cfg.num_kv_heads, cfg.head_dim, jnp.float32)
    pmeta = PagedAttnMeta(
        positions=jnp.arange(T)[None],
        slot_mapping=jnp.asarray([[4, 5, 6, 7, 8, 9, 10, 11]], jnp.int32),
        block_tables=jnp.asarray([[1, 2]], jnp.int32),
        kv_lens=jnp.full((B,), T, jnp.int32),
        active=jnp.ones((B,)),
    )
    h_p, _ = decoder_forward(params, cfg, rope, jnp.asarray(ids), pcache, pmeta)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_d), rtol=1e-5, atol=1e-5)


def test_head_major_layout_matches_token_major():
    """Both physical KV pool layouts must generate identical tokens: the
    engine picks token-major at short context (fastest scatter/gather) and
    head-major at >=4096 span (what the Pallas decode kernel streams)."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg = _tiny_cfg()
    params = _rand_params(cfg)
    rope = make_rope(cfg)
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, cfg.vocab_size, size=13).tolist()

    def run(head_major):
        pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2,
                            max_model_len=64, prefill_buckets=(8, 16),
                            dtype=jnp.float32, decode_steps=2,
                            kv_head_major=head_major)
        pipe = TextPipeline(cfg, params, rope, pc)
        assert pipe.cache.head_major is head_major
        eng = Engine(pipe, eos_token_ids=set())
        toks, _ = eng.generate(list(prompt), SamplingParams(max_len=10))
        return toks

    assert run(True) == run(False)


def test_blockwise_continuation_matches_reference():
    """blockwise_prefill_continuation (online-softmax scan over KV blocks)
    == gather+dense paged_attention_reference, at a span that on the real
    path would engage it (>4k), incl. sliding-window / softcap / window-gate
    variants and both pool layouts."""
    from mistralrs_tpu.ops.paged_attention import (
        blockwise_prefill_continuation,
        paged_attention_reference,
        write_paged_kv,
    )

    B, T, Hq, Hkv, D, page = 2, 8, 4, 2, 16, 4
    MP = 1088  # span 4352 > 4096
    rng = np.random.default_rng(3)
    for hm in (False, True):
        num_pages = 64
        shape = ((1, Hkv, num_pages, page, D) if hm
                 else (1, num_pages, page, Hkv, D))
        ck = jnp.asarray(rng.standard_normal(shape[1:]), jnp.float32)
        cv = jnp.asarray(rng.standard_normal(shape[1:]), jnp.float32)
        # each row's logical blocks cycle through the small pool (the op only
        # reads pages the mask keeps, so repeated pages are fine)
        tables = np.stack([
            (np.arange(MP) % (num_pages - 1)) + 1 for _ in range(B)
        ]).astype(np.int32)
        kv_lens = np.asarray([150, 37], np.int32)  # includes the chunk
        q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.float32)
        meta = PagedAttnMeta(
            positions=jnp.asarray(kv_lens[:, None] - T + np.arange(T)[None]),
            slot_mapping=jnp.zeros((B, T), jnp.int32),
            block_tables=jnp.asarray(tables),
            kv_lens=jnp.asarray(kv_lens),
            active=jnp.ones((B,), jnp.float32),
            head_major=hm,
        )
        scale = D**-0.5
        for win, cap, gate in [(None, None, None), (64, None, None),
                               (None, 30.0, None),
                               (64, None, jnp.asarray(True)),
                               (64, None, jnp.asarray(False))]:
            # reference path masks by the same rules
            eff_win = win if gate is None or bool(gate) else None
            want = np.asarray(paged_attention_reference(
                q, ck, cv, meta, scale=scale, sliding_window=eff_win,
                logits_softcap=cap))
            got = np.asarray(blockwise_prefill_continuation(
                q, ck, cv, meta, scale=scale, sliding_window=win,
                window_gate=gate, logits_softcap=cap, kv_block=256))
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5,
                                       err_msg=f"hm={hm} win={win} cap={cap}")


def test_blockwise_continuation_int8_pools_match_dense():
    """blockwise_prefill_continuation over (payload, scale) int8 pools ==
    the dense reference over the fully-dequantized pool. This is the route
    that makes 64k int8-KV decode compile (per-block dequant bounds the
    bf16 transient to O(kv_block); the one-shot gather's is O(span))."""
    from mistralrs_tpu.ops.paged_attention import (
        blockwise_prefill_continuation,
        paged_attention_reference,
    )

    B, T, Hq, Hkv, D, page = 2, 4, 4, 2, 16, 4
    MP = 1088  # span 4352 > 4096 engages blockwise on the real path
    rng = np.random.default_rng(11)
    for hm in (False, True):
        num_pages = 64
        pshape = ((Hkv, num_pages, page, D) if hm
                  else (num_pages, page, Hkv, D))
        sshape = pshape[:-1]
        kq = rng.integers(-127, 128, size=pshape).astype(np.int8)
        vq = rng.integers(-127, 128, size=pshape).astype(np.int8)
        ks = (rng.random(sshape) * 0.02 + 0.001).astype(np.float32)
        vs = (rng.random(sshape) * 0.02 + 0.001).astype(np.float32)
        ck = (jnp.asarray(kq), jnp.asarray(ks))
        cv = (jnp.asarray(vq), jnp.asarray(vs))
        # dense f32 pools the reference path consumes
        dk = jnp.asarray(kq.astype(np.float32) * ks[..., None])
        dv = jnp.asarray(vq.astype(np.float32) * vs[..., None])
        tables = np.stack([
            (np.arange(MP) % (num_pages - 1)) + 1 for _ in range(B)
        ]).astype(np.int32)
        kv_lens = np.asarray([150, 37], np.int32)
        q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.float32)
        meta = PagedAttnMeta(
            positions=jnp.asarray(kv_lens[:, None] - T + np.arange(T)[None]),
            slot_mapping=jnp.zeros((B, T), jnp.int32),
            block_tables=jnp.asarray(tables),
            kv_lens=jnp.asarray(kv_lens),
            active=jnp.ones((B,), jnp.float32),
            head_major=hm,
        )
        scale = D**-0.5
        want = np.asarray(paged_attention_reference(
            q, dk, dv, meta, scale=scale))
        got = np.asarray(blockwise_prefill_continuation(
            q, ck, cv, meta, scale=scale, kv_block=256))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=f"hm={hm}")


def test_swap_out_in_roundtrip_both_layouts():
    """swap_out_pages -> host -> swap_in_pages restores page contents
    exactly, token-major and head-major (ref cache_engine swap_blocks)."""
    from mistralrs_tpu.ops.paged_attention import (
        PagedKVCache, swap_in_pages, swap_out_pages,
    )

    rng = np.random.default_rng(9)
    for hm in (False, True):
        cache = PagedKVCache.create(2, 8, 4, 2, 8, jnp.float32, head_major=hm)
        full_k = rng.standard_normal(cache.k.shape).astype(np.float32)
        full_v = rng.standard_normal(cache.v.shape).astype(np.float32)
        cache = type(cache)(k=jnp.asarray(full_k), v=jnp.asarray(full_v),
                            head_major=hm)
        pages = [3, 5, 1]
        host = swap_out_pages(cache, pages)
        # clobber those pages, then restore into different slots
        zeros = jnp.zeros_like(cache.k)
        cache = type(cache)(k=zeros, v=zeros, head_major=hm)
        dest = [2, 6, 7]
        cache = swap_in_pages(cache, host, dest)
        ax = cache.page_axis
        for src_p, dst_p in zip(pages, dest):
            got_k = np.take(np.asarray(cache.k), dst_p, axis=ax)
            want_k = np.take(full_k, src_p, axis=ax)
            np.testing.assert_array_equal(got_k, want_k)
            got_v = np.take(np.asarray(cache.v), dst_p, axis=ax)
            np.testing.assert_array_equal(got_v, np.take(full_v, src_p, axis=ax))
