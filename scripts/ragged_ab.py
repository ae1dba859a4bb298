"""A/B the unified ragged-paged-attention kernel vs the current decode
attention paths at 7B serving shapes (Hq=32, Hkv=8, D=128, page 16,
batch 16): gather+SDPA (span < 4k today) and the Pallas block-table decode
kernel (span >= 4k today). If the ragged kernel wins both, stage 2 of
ops/ragged_attention.py's adoption plan (combined PagedKVCache layout +
engine cu_q_lens plumbing) is justified — it also unifies prefill and
removes the window/softcap decode restrictions.

Run: python scripts/ragged_ab.py  (expects the TPU tunnel up)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

ITERS = 50


def _time(f, x, *ws) -> float:
    """KV pools passed as ARGS — closed-over device arrays become jit
    constants and the axon AOT compile ships them through the tunnel
    (~270 MB/pool at span 8k; the r3 queue run produced zero output in its
    580 s window on exactly that)."""
    import jax

    g = jax.jit(lambda v, *w: jax.lax.scan(
        lambda h, _: (f(h, *w), None), v, None, length=ITERS)[0])
    np.asarray(g(x, *ws))
    t0 = time.time()
    np.asarray(g(x, *ws))
    return (time.time() - t0) / ITERS


def main():
    import jax.numpy as jnp

    from mistralrs_tpu.ops import attention as attn_ops
    from mistralrs_tpu.ops.paged_attention import (
        PagedAttnMeta, gather_paged_kv,
    )
    from mistralrs_tpu.ops.ragged_attention import combine_kv, ragged_attention

    import jax

    rng = np.random.default_rng(9)
    B, Hq, Hkv, D, page = 16, 32, 8, 128, 16
    for span in (2048, 8192):
        pages_per_seq = span // page
        P = B * pages_per_seq + 1
        # generate ON DEVICE: host-side standard_normal of ~270 MB pools +
        # tunnel upload blew the 580 s queue cap
        ks = jax.random.split(jax.random.key(span), 2)
        k_hm = jax.random.normal(ks[0], (Hkv, P, page, D), jnp.bfloat16) * 0.3
        v_hm = jax.random.normal(ks[1], (Hkv, P, page, D), jnp.bfloat16) * 0.3
        tables = (np.arange(B * pages_per_seq, dtype=np.int32) + 1).reshape(
            B, pages_per_seq)
        kv_lens = np.full((B,), span - 5, np.int32)
        q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)) * 0.3, jnp.bfloat16)
        scale = D**-0.5

        # 1. gather + head-major SDPA (current span<4k path)
        def gather_sdpa(qq, k_hm, v_hm):
            ctx_k, ctx_v = gather_paged_kv(
                k_hm, v_hm, jnp.asarray(tables), head_major=True)
            bias = attn_ops.causal_mask_bias(
                1, span, q_offsets=jnp.asarray(kv_lens) - 1)
            pad = jnp.where(jnp.arange(span)[None] < jnp.asarray(kv_lens)[:, None],
                            0.0, attn_ops.NEG_INF)
            return attn_ops.sdpa_head_major(
                qq, ctx_k.astype(qq.dtype), ctx_v.astype(qq.dtype),
                scale=scale, mask=bias + pad[:, None, None, :])

        # 2. existing Pallas block-table decode kernel
        from mistralrs_tpu.ops.paged_attention import paged_decode_attention

        meta = PagedAttnMeta(
            positions=jnp.asarray(kv_lens[:, None] - 1),
            slot_mapping=jnp.zeros((B, 1), jnp.int32),
            block_tables=jnp.asarray(tables),
            kv_lens=jnp.asarray(kv_lens),
            active=jnp.ones((B,), jnp.float32),
            head_major=True,
        )

        def decode_kernel(qq, k_hm, v_hm):
            return paged_decode_attention(qq, k_hm, v_hm, meta, scale=scale)

        # 2b. int8-quantized pools through the same gather+SDPA path
        # (kv_quant=True serving): half the KV bytes streamed per step
        from mistralrs_tpu.ops.paged_attention import gather_paged_kv_q

        k_q8 = (k_hm * 10).astype(jnp.int8)
        v_q8 = (v_hm * 10).astype(jnp.int8)
        ks8 = jnp.full(k_hm.shape[:-1], 0.1, jnp.float32)
        vs8 = jnp.full(v_hm.shape[:-1], 0.1, jnp.float32)

        def gather_sdpa_int8(qq, k_q8, ks8, v_q8, vs8):
            ctx_k, ctx_v = gather_paged_kv_q(
                (k_q8, ks8), (v_q8, vs8), jnp.asarray(tables),
                head_major=True, dtype=qq.dtype)
            bias = attn_ops.causal_mask_bias(
                1, span, q_offsets=jnp.asarray(kv_lens) - 1)
            pad = jnp.where(jnp.arange(span)[None] < jnp.asarray(kv_lens)[:, None],
                            0.0, attn_ops.NEG_INF)
            return attn_ops.sdpa_head_major(
                qq, ctx_k, ctx_v, scale=scale,
                mask=bias + pad[:, None, None, :])

        # 3. ragged kernel (decode: q_len 1 per seq)
        pool = combine_kv(k_hm, v_hm)
        cu = jnp.arange(B + 1, dtype=jnp.int32)

        def ragged(qq, pool):
            return ragged_attention(
                qq.reshape(B, Hq, D), pool, jnp.asarray(kv_lens),
                jnp.asarray(tables), cu, jnp.asarray([B], jnp.int32),
                scale=scale)

        for name, fn, ops in [
            ("gather+sdpa", gather_sdpa, (k_hm, v_hm)),
            ("gather+sdpa int8KV", gather_sdpa_int8, (k_q8, ks8, v_q8, vs8)),
            ("paged decode kernel", decode_kernel, (k_hm, v_hm)),
            ("ragged kernel", ragged, (pool,)),
        ]:
            try:
                dt = _time(lambda v, *w, f=fn: (f(v, *w).sum() * 0 + v),
                           q, *ops)
                print(f"span {span:5d} {name:20s}: {dt * 1e3:7.3f} ms/layer-step",
                      flush=True)
            except Exception as e:
                print(f"span {span:5d} {name:20s}: FAIL {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
