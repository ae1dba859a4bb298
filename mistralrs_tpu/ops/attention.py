"""Scaled-dot-product attention: jnp reference path + dispatch.

Reference parity: mistralrs-core/src/layers.rs ScaledDotProductAttention
dispatch (:475-560, flash-attn -> cuBLASLt fused -> naive) and
layers_masker.rs CausalMasker (:8-290, causal + sliding-window bias).

TPU design: einsum-based implementations with f32 softmax that XLA maps
onto the MXU (batch-major `sdpa` and head-major `sdpa_head_major` for the
paged gather layout); decode at long context spans uses the Pallas
block-table kernel (ops/paged_attention.py). GQA is computed by folding the
query-head group axis into the einsum instead of materializing repeated KV —
the TPU equivalent of the reference's `repeat_kv` elision.

Mask convention: additive f32 bias (0 = keep, -inf = drop), or the structured
helpers below which avoid materializing [T, S] masks where a banded form works.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def block_attend(qg, k, v, keep, *, logits_softcap=None):
    """Partial attention of queries against ONE key/value block, in
    running-softmax form (the flash/blockwise/ring building block).

    qg: [B, T, Hkv, G, D] pre-scaled queries (GQA group axis folded out of
    the KV heads); k/v: [B, S, Hkv, D]; keep: boolean mask broadcastable to
    [B, T, S]. Returns (bm, bl, bo) with bm/bl [B, Hkv, G, T] (block max /
    exp-sum) and bo [B, T, Hkv, G, D] (unnormalized block output). Fully
    masked rows yield bm=NEG_INF (finite), bl=0, bo=0 — safe to combine.
    """
    s = jnp.einsum("bthgd,bshd->bhgts", qg, k,
                   preferred_element_type=jnp.float32)
    if logits_softcap is not None:
        s = jnp.tanh(s / logits_softcap) * logits_softcap
    keep = jnp.broadcast_to(keep, s.shape[:1] + s.shape[3:])  # [B, T, S]
    s = jnp.where(keep[:, None, None], s, NEG_INF)
    bm = jnp.max(s, axis=-1)  # [B, Hkv, G, T]
    # rows fully masked: exp(NEG_INF - NEG_INF) = 1 -> zero them explicitly
    p = jnp.where(s > NEG_INF / 2, jnp.exp(s - bm[..., None]), 0.0)
    bl = jnp.sum(p, axis=-1)
    bo = jnp.einsum("bhgts,bshd->bthgd", p, v.astype(jnp.float32))
    return bm, bl, bo


def flash_combine(m, l, acc, bm, bl, bo):
    """Merge one block's (bm, bl, bo) into the running (m, l, acc)
    accumulators (online-softmax rescale). m/l/bm/bl: [B, Hkv, G, T];
    acc/bo: [B, T, Hkv, G, D]. NEG_INF is finite, so never-attended rows
    combine as identity."""
    new_m = jnp.maximum(m, bm)
    alpha = jnp.exp(m - new_m)
    beta = jnp.exp(bm - new_m)
    l = l * alpha + bl * beta

    def expand(x):  # [B, Hkv, G, T] -> [B, T, Hkv, G, 1]
        return x.transpose(0, 3, 1, 2)[..., None]

    acc = acc * expand(alpha).astype(acc.dtype) + bo * expand(beta).astype(acc.dtype)
    return new_m, l, acc


def finalize_flash(l, acc):
    """acc [B, T, Hkv, G, D] / l [B, Hkv, G, T] -> [B, T, Hkv*G, D]."""
    B, T, Hkv, G, D = acc.shape
    norm = l.transpose(0, 3, 1, 2).reshape(B, T, Hkv * G)[..., None]
    return acc.reshape(B, T, Hkv * G, D) / jnp.maximum(norm, 1e-20).astype(acc.dtype)


def causal_mask_bias(
    q_len: int,
    kv_len: int,
    *,
    q_offsets: jax.Array | None = None,
    sliding_window: int | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Additive causal (+ optional sliding-window) bias.

    q_offsets: [B] absolute position of each batch row's first query token
    (queries attend to kv positions <= q_offset + i). kv positions are 0..kv_len.
    Returns [B, 1, q_len, kv_len] if q_offsets given else [1, 1, q_len, kv_len].
    Ref: layers_masker.rs make_causal_mask / sliding-window variant.
    """
    q_ids = jnp.arange(q_len)[:, None]
    kv_ids = jnp.arange(kv_len)[None, :]
    if q_offsets is not None:
        q_pos = q_ids[None] + q_offsets[:, None, None]  # [B, T, 1]
        kv = kv_ids[None]
    else:
        q_pos = q_ids[None]
        kv = kv_ids[None]
    keep = kv <= q_pos
    if sliding_window is not None:
        keep &= kv > q_pos - sliding_window
    bias = jnp.where(keep, 0.0, NEG_INF).astype(dtype)
    return bias[:, None]


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    mask: jax.Array | None = None,
    logits_softcap: float | None = None,
) -> jax.Array:
    """GQA attention, einsum formulation. q:[B,T,Hq,D] k,v:[B,S,Hkv,D] -> [B,T,Hq,D].

    mask: additive bias broadcastable to [B, 1|Hq, T, S]. Softmax in f32.
    logits_softcap: Gemma-2 attn softcapping (tanh) applied pre-mask.
    """
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    assert Hq % Hkv == 0, (Hq, Hkv)
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D)
    # scores: [B, Hkv, G, T, S]
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if logits_softcap is not None:
        scores = logits_softcap * jnp.tanh(scores / logits_softcap)
    if mask is not None:
        m = mask.astype(jnp.float32)
        # broadcast [B,1|Hq,T,S] onto [B,Hkv,G,T,S]
        if m.shape[1] == 1:
            m = m[:, :, None]
        else:
            m = m.reshape(m.shape[0], Hkv, G, *m.shape[2:])
        scores = scores + m
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", probs.astype(v.dtype), v)
    return out.reshape(B, T, Hq, D)


def gqa_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    q_offsets: jax.Array | None = None,
    kv_lens: jax.Array | None = None,
    sliding_window: int | None = None,
    logits_softcap: float | None = None,
) -> jax.Array:
    """Causal GQA attention over a (possibly right-padded) KV buffer.

    kv_lens: [B] number of valid kv positions per row (padding beyond is masked).
    q_offsets: [B] absolute position of first query token (for decode/chunked
    prefill where the KV buffer holds earlier context).
    """
    B, T, _, _ = q.shape
    S = k.shape[1]
    offs = q_offsets if q_offsets is not None else jnp.zeros((B,), jnp.int32)
    bias = causal_mask_bias(T, S, q_offsets=offs, sliding_window=sliding_window)
    if kv_lens is not None:
        pad = jnp.where(jnp.arange(S)[None] < kv_lens[:, None], 0.0, NEG_INF)
        bias = bias + pad[:, None, None, :]
    return sdpa(q, k, v, scale=scale, mask=bias, logits_softcap=logits_softcap)


def sdpa_head_major(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    mask: jax.Array | None = None,
    logits_softcap: float | None = None,
) -> jax.Array:
    """GQA attention with head-major context: q:[B,T,Hq,D],
    k,v:[Hkv,B,S,D] -> [B,T,Hq,D].

    The paged gather produces context in [Hkv, B, S, D] (the pool layout's
    natural order); consuming it directly avoids materializing a transposed
    copy of the whole gathered context every layer."""
    B, T, Hq, D = q.shape
    Hkv = k.shape[0]
    assert Hq % Hkv == 0, (Hq, Hkv)
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D)
    scores = jnp.einsum("bthgd,hbsd->bhgts", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if logits_softcap is not None:
        scores = logits_softcap * jnp.tanh(scores / logits_softcap)
    if mask is not None:
        m = mask if mask.ndim == 4 else mask[None]
        scores = scores + m[:, :, None].astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,hbsd->bthgd", probs, v.astype(q.dtype))
    return out.reshape(B, T, Hq, D).astype(q.dtype)
