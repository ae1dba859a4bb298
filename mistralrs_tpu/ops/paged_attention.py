"""Paged (block-table) KV cache ops — jnp reference implementations.

Reference parity: mistralrs-paged-attn CUDA kernels (SURVEY.md §2.2) —
`reshape_and_cache` (scatter new KV into pages), `paged_attention` v1/v2
(decode over block tables), `copy_blocks`/`swap_blocks` — and
mistralrs-core/src/paged_attention/cache_engine.rs block tensors.

TPU layout: pages are ``[L, Hkv, P, page_size, D]`` — the kv-head axis
leads (after layers) so each head's pool is contiguous, which is both the
sharding axis (head-parallel KV) and the layout the Pallas decode kernel
streams (jax.experimental.pallas.ops.tpu.paged_attention). page_size is a
multiple of the (8,128)/(16,128) tile so each page is a whole number of
tiles.
Page 0 of every layer is a *garbage page*: padding tokens' slot_mapping points
into it, so writes need no masking (the reference handles padding with
slot_mapping -1 checks in CUDA; here a reserved page keeps the scatter
branch-free).

These jnp formulations are correct on any backend and are the baseline the
Pallas TPU kernel (ops/paged_attention_kernel.py) is tested against.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from mistralrs_tpu.ops.attention import NEG_INF, sdpa


@struct.dataclass
class PagedKVCache:
    """k/v pages. Two physical layouts (static `head_major` flag):

    - token-major [L, P, page, Hkv, D]: fastest scatter/gather at short
      context (every page row is one token's heads, contiguous);
    - head-major [L, Hkv, P, page, D]: the layout the Pallas block-table
      decode kernel streams; selected for long-context configs.

    Page 0 is reserved as garbage."""

    k: jax.Array
    v: jax.Array
    # int8-quantized pools (quant=True): k/v hold int8 payloads and these
    # hold one f32 scale per (slot, head) — dequant = payload * scale.
    # ~3% overhead at D=128; halves KV HBM traffic and doubles page capacity
    # vs bf16 (no reference equivalent; PAPERS.md KV-quant line).
    k_scale: Any = None
    v_scale: Any = None
    head_major: bool = struct.field(pytree_node=False, default=False)
    # split pools (r5, VERDICT r4 #6): k/v (+scales) are TUPLES of per-scan-
    # group arrays [size_g, ...] instead of one [L, ...] array. Two wins:
    # (1) no single array exceeds the ~4 GB size the remote compile helper
    # tolerates, so 32k bf16 full-model KV compiles; (2) the decoder's
    # per-group cache slices become whole arrays — no slice/splice at group
    # boundaries (the ~1 ms/step h/KV copy-start cost in the r4 trace).
    splits: Any = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, num_layers, num_pages, page_size, kv_heads, head_dim,
               dtype=jnp.bfloat16, head_major: bool = False,
               quant: bool = False, combined: bool = False,
               splits: tuple | None = None):
        if splits is not None:
            assert not combined, "split pools unsupported for combined layout"
            assert sum(splits) == num_layers, (splits, num_layers)
            parts = [cls.create(s, num_pages, page_size, kv_heads, head_dim,
                                dtype, head_major, quant) for s in splits]
            return cls(k=tuple(p.k for p in parts),
                       v=tuple(p.v for p in parts),
                       k_scale=(tuple(p.k_scale for p in parts)
                                if quant else None),
                       v_scale=(tuple(p.v_scale for p in parts)
                                if quant else None),
                       head_major=head_major, splits=tuple(splits))
        if combined:
            # the ragged-paged-attention kernel's layout: ONE pool with K at
            # even and V at odd head indices (ops/ragged_attention.py);
            # token-major by construction, stored in `k` with v=None
            assert not head_major and not quant
            shape = (num_layers, num_pages, page_size, 2 * kv_heads, head_dim)
            return cls(k=jnp.zeros(shape, dtype), v=None, head_major=False)
        if head_major:
            shape = (num_layers, kv_heads, num_pages, page_size, head_dim)
        else:
            shape = (num_layers, num_pages, page_size, kv_heads, head_dim)
        if quant:
            sshape = shape[:-1]  # per-(slot, head) scales
            return cls(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(sshape, jnp.float32),
                       v_scale=jnp.zeros(sshape, jnp.float32),
                       head_major=head_major)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   head_major=head_major)

    @property
    def is_split(self) -> bool:
        return self.splits is not None

    @property
    def _k0(self) -> jax.Array:
        return self.k[0] if self.is_split else self.k

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def combined(self) -> bool:
        return self.v is None

    @property
    def page_size(self) -> int:
        return self._k0.shape[3] if self.head_major else self._k0.shape[2]

    @property
    def num_pages(self) -> int:
        return self._k0.shape[2] if self.head_major else self._k0.shape[1]

    @property
    def page_axis(self) -> int:
        """Axis of the page index in the full [L, ...] arrays (COW copies)."""
        return 2 if self.head_major else 1


@struct.dataclass
class PagedAttnMeta:
    """Step metadata for the paged backend.

    positions:    [B, T] absolute positions of query tokens
    slot_mapping: [B, T] flat destination slot (page_idx * page_size + offset)
                  for each new token; padding tokens point into page 0
    block_tables: [B, MAX_PAGES] page index per logical block (0-padded)
    kv_lens:      [B] context length after this step's write
    active:       [B] 1.0 live row / 0.0 padding slot
    """

    positions: jax.Array
    slot_mapping: jax.Array
    block_tables: jax.Array
    kv_lens: jax.Array
    active: jax.Array
    # static: this step is the FIRST prefill chunk (positions start at 0 for
    # every row), so the chunk's own K/V is the entire context — prefill can
    # run the Pallas flash kernel on it without a paged gather
    first_chunk: bool = struct.field(pytree_node=False, default=False)
    # static: KV pool layout of the cache slices this step receives
    head_major: bool = struct.field(pytree_node=False, default=False)
    # static: sequence-parallel first-chunk prefill — name of the mesh axis
    # the chunk's token dim is sharded over (ring attention), plus the mesh
    # itself (hashable; needed to build the shard_map inside the jitted step)
    ring_axis: str | None = struct.field(pytree_node=False, default=None)
    ring_mesh: Any = struct.field(pytree_node=False, default=None)


def write_paged_kv(
    cache_k: jax.Array,  # one layer; layout per `head_major`
    cache_v: jax.Array,
    new_k: jax.Array,  # [B, T, Hkv, D]
    new_v: jax.Array,
    slot_mapping: jax.Array,  # [B, T]
    head_major: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """reshape_and_cache: scatter new KV rows into pages (one layer)."""
    idx = slot_mapping.reshape(-1)
    if head_major:
        H, P, page, D = cache_k.shape
        flat_k = cache_k.reshape(H, P * page, D)
        flat_v = cache_v.reshape(H, P * page, D)
        nk = new_k.reshape(-1, H, D).swapaxes(0, 1).astype(cache_k.dtype)
        nv = new_v.reshape(-1, H, D).swapaxes(0, 1).astype(cache_v.dtype)
        flat_k = flat_k.at[:, idx].set(nk, mode="drop")
        flat_v = flat_v.at[:, idx].set(nv, mode="drop")
    else:
        P, page, H, D = cache_k.shape
        flat_k = cache_k.reshape(P * page, H, D)
        flat_v = cache_v.reshape(P * page, H, D)
        nk = new_k.reshape(-1, H, D).astype(cache_k.dtype)
        nv = new_v.reshape(-1, H, D).astype(cache_v.dtype)
        flat_k = flat_k.at[idx].set(nk, mode="drop")
        flat_v = flat_v.at[idx].set(nv, mode="drop")
    return flat_k.reshape(cache_k.shape), flat_v.reshape(cache_v.shape)


def _quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[B, T, H, D] -> (int8 payload, f32 per-(token, head) scale)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127)
    return q.astype(jnp.int8), s


def _write_scale(scale_pool: jax.Array, new_s: jax.Array, idx: jax.Array,
                 head_major: bool) -> jax.Array:
    """Scatter per-(token, head) scales like write_paged_kv does payloads."""
    if head_major:  # [H, P, page]
        H, P, page = scale_pool.shape
        flat = scale_pool.reshape(H, P * page)
        return flat.at[:, idx].set(new_s.reshape(-1, H).T, mode="drop").reshape(
            scale_pool.shape)
    P, page, H = scale_pool.shape
    flat = scale_pool.reshape(P * page, H)
    return flat.at[idx].set(new_s.reshape(-1, H), mode="drop").reshape(
        scale_pool.shape)


def write_paged_kv_q(
    ck: tuple[jax.Array, jax.Array],  # (int8 payload, f32 scale) one layer
    cv: tuple[jax.Array, jax.Array],
    new_k: jax.Array,  # [B, T, Hkv, D]
    new_v: jax.Array,
    slot_mapping: jax.Array,  # [B, T]
    head_major: bool = False,
) -> tuple[tuple[jax.Array, jax.Array], tuple[jax.Array, jax.Array]]:
    """reshape_and_cache for int8 pools: per-(token, head) absmax scales."""
    idx = slot_mapping.reshape(-1)
    qk, sk = _quantize_rows(new_k)
    qv, sv = _quantize_rows(new_v)
    pk, pv = write_paged_kv(ck[0], cv[0], qk, qv, slot_mapping, head_major)
    return (
        (pk, _write_scale(ck[1], sk, idx, head_major)),
        (pv, _write_scale(cv[1], sv, idx, head_major)),
    )


def gather_paged_kv_q(
    ck: tuple[jax.Array, jax.Array],
    cv: tuple[jax.Array, jax.Array],
    block_tables: jax.Array,
    head_major: bool = False,
    dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """Gather + dequantize int8 pools to `dtype` (layouts as gather_paged_kv)."""
    B, MP = block_tables.shape
    flat = block_tables.reshape(-1)
    if head_major:
        H, P, page, D = ck[0].shape
        k = jnp.take(ck[0], flat, axis=1).reshape(H, B, MP * page, D)
        v = jnp.take(cv[0], flat, axis=1).reshape(H, B, MP * page, D)
        sk = jnp.take(ck[1], flat, axis=1).reshape(H, B, MP * page)
        sv = jnp.take(cv[1], flat, axis=1).reshape(H, B, MP * page)
    else:
        P, page, H, D = ck[0].shape
        k = jnp.take(ck[0], flat, axis=0).reshape(B, MP * page, H, D)
        v = jnp.take(cv[0], flat, axis=0).reshape(B, MP * page, H, D)
        sk = jnp.take(ck[1], flat, axis=0).reshape(B, MP * page, H)
        sv = jnp.take(cv[1], flat, axis=0).reshape(B, MP * page, H)
    k = k.astype(dtype) * sk[..., None].astype(dtype)
    v = v.astype(dtype) * sv[..., None].astype(dtype)
    return k, v


def gather_paged_kv(
    cache_k: jax.Array,  # one layer; layout per `head_major`
    cache_v: jax.Array,
    block_tables: jax.Array,  # [B, MAX_PAGES]
    head_major: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Gather each row's context (reshape-only from the pool layout, no
    transposed copies):

    - head-major pools -> [Hkv, B, S, D] (consumed by sdpa_head_major)
    - token-major pools -> [B, S, Hkv, D] (consumed by sdpa)
    """
    B, MP = block_tables.shape
    if head_major:
        H, P, page, D = cache_k.shape
        k = jnp.take(cache_k, block_tables.reshape(-1), axis=1)
        v = jnp.take(cache_v, block_tables.reshape(-1), axis=1)
        return (
            k.reshape(H, B, MP * page, D),
            v.reshape(H, B, MP * page, D),
        )
    P, page, H, D = cache_k.shape
    k = jnp.take(cache_k, block_tables.reshape(-1), axis=0)
    v = jnp.take(cache_v, block_tables.reshape(-1), axis=0)
    return (
        k.reshape(B, MP * page, H, D),
        v.reshape(B, MP * page, H, D),
    )


def paged_attention_reference(
    q: jax.Array,  # [B, T, Hq, D]
    cache_k: jax.Array,  # [Hkv, P, page, D] (one layer)
    cache_v: jax.Array,
    meta: PagedAttnMeta,
    *,
    scale: float,
    sliding_window: int | None = None,
    logits_softcap: float | None = None,
) -> jax.Array:
    """Attention of q against the paged context (gather + dense SDPA).

    Works for both decode (T=1) and chunked prefill (the chunk's own KV must
    already be written via write_paged_kv). The gathered buffer holds
    positions in order because pages in a row's block table are its logical
    blocks in sequence order.
    """
    from mistralrs_tpu.ops.attention import sdpa, sdpa_head_major

    B, T = q.shape[0], q.shape[1]
    hm = getattr(meta, "head_major", False)
    k, v = gather_paged_kv(cache_k, cache_v, meta.block_tables, head_major=hm)
    S = k.shape[2] if hm else k.shape[1]
    q_off = meta.kv_lens - T  # first query token's absolute position
    q_ids = jnp.arange(T)[None, :] + q_off[:, None]  # [B, T]
    kv_ids = jnp.arange(S)[None, :]
    keep = kv_ids[:, None, :] <= q_ids[:, :, None]  # [B, T, S] causal
    keep &= (kv_ids < meta.kv_lens[:, None])[:, None, :]
    if sliding_window is not None:
        keep &= kv_ids[:, None, :] > q_ids[:, :, None] - sliding_window
    bias = jnp.where(keep, 0.0, NEG_INF)[:, None]  # [B, 1, T, S]
    attn = sdpa_head_major if hm else sdpa
    return attn(
        q, k.astype(q.dtype), v.astype(q.dtype),
        scale=scale, mask=bias, logits_softcap=logits_softcap,
    )


def paged_decode_attention(
    q: jax.Array,  # [B, 1, Hq, D]
    cache_k: jax.Array,  # [Hkv, P, page, D] (one layer)
    cache_v: jax.Array,
    meta: PagedAttnMeta,
    *,
    scale: float,
    logits_softcap: float | None = None,
    pages_per_compute_block: int = 8,
) -> jax.Array:
    """Fused Pallas block-table decode attention (TPU): streams only the
    pages named in each row's table instead of materializing the gathered
    context in HBM (the CUDA paged_attention v1/v2 equivalent).

    The kernel computes raw q.k^T, so the softmax scale is folded into q.
    """
    from jax.experimental.pallas.ops.tpu.paged_attention.paged_attention_kernel import (
        paged_attention,
    )

    B = q.shape[0]
    q3 = (q[:, 0] * jnp.asarray(scale, q.dtype)).astype(cache_k.dtype)  # [B, Hq, D]
    MP = meta.block_tables.shape[1]
    ppcb = pages_per_compute_block
    while MP % ppcb:
        ppcb //= 2
    out = paged_attention(
        q3,
        cache_k,
        cache_v,
        meta.kv_lens.astype(jnp.int32),
        meta.block_tables.astype(jnp.int32),
        attn_logits_soft_cap=logits_softcap,
        pages_per_compute_block=max(ppcb, 1),
    )
    return out.astype(q.dtype)[:, None]  # [B, 1, Hq, D]


def flash_prefill_continuation(
    q: jax.Array,  # [B, T, Hq, D] chunk queries (positions start..start+T)
    cache_k: jax.Array,  # [Hkv, P, page, D] (chunk already written)
    cache_v: jax.Array,
    meta: PagedAttnMeta,
    *,
    scale: float,
) -> jax.Array:
    """Flash attention for continuation prefill chunks over the paged context.

    The TPU flash kernel's causal mask is top-left (col <= row on raw
    indices), so both the gathered KV pages and the chunk's query rows are
    RIGHT-ALIGNED into the static span S = MAX_PAGES*page such that the col
    of kv position p and the row of query position p coincide; segment ids
    mask the left padding and the partially-filled last page's tail. This
    avoids materializing the [B, Hq, T, S] score matrix of the dense path —
    which dominates prefill HBM traffic at long context.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    B, T, Hq, D = q.shape
    hm = getattr(meta, "head_major", False)
    Hkv = cache_k.shape[0] if hm else cache_k.shape[2]
    page = cache_k.shape[2] if hm else cache_k.shape[1]
    MP = meta.block_tables.shape[1]
    S = MP * page

    used_pages = (meta.kv_lens + page - 1) // page  # [B]
    shift = MP - used_pages  # right-align whole pages
    col = jnp.arange(MP)[None, :]  # [1, MP]
    src = col - shift[:, None]
    tables = jnp.where(
        src >= 0,
        jnp.take_along_axis(meta.block_tables, jnp.clip(src, 0, MP - 1), axis=1),
        0,
    )
    k, v = gather_paged_kv(cache_k, cache_v, tables, head_major=hm)
    rep = Hq // Hkv
    if hm:  # [Hkv, B, S, D]
        kf = jnp.repeat(k, rep, axis=0) if rep > 1 else k
        vf = jnp.repeat(v, rep, axis=0) if rep > 1 else v
        kf = kf.transpose(1, 0, 2, 3)  # [B, Hq, S, D]
        vf = vf.transpose(1, 0, 2, 3)
    else:  # [B, S, Hkv, D]
        kf = jnp.repeat(k, rep, axis=2) if rep > 1 else k
        vf = jnp.repeat(v, rep, axis=2) if rep > 1 else v
        kf = kf.transpose(0, 2, 1, 3)  # [B, Hq, S, D]
        vf = vf.transpose(0, 2, 1, 3)

    # kv col f holds position p = f - (S - used*page); real iff 0 <= p < kv_len
    base = S - used_pages * page  # [B]
    flat = jnp.arange(S)[None, :]
    kv_seg = ((flat >= base[:, None]) & (flat < base[:, None] + meta.kv_lens[:, None]))

    # query token i (position start+i, start = kv_len - T) sits at row
    # base + start + i so that row == col of its own position
    start = meta.kv_lens - T
    row0 = base + start  # [B]
    rows = row0[:, None] + jnp.arange(T)[None, :]  # [B, T]
    qs = (q * jnp.asarray(scale, q.dtype)).transpose(0, 2, 1, 3)  # [B, Hq, T, D]
    q_pad = jnp.zeros((B, Hq, S, D), qs.dtype)
    q_pad = jax.vmap(lambda qp, qb, r: qp.at[:, r].set(qb))(q_pad, qs, rows)
    q_seg = jnp.zeros((B, S), jnp.int32)
    q_seg = jax.vmap(lambda s, r: s.at[r].set(1))(q_seg, rows)

    out = flash_attention(
        q_pad.astype(jnp.float32),
        kf.astype(jnp.float32),
        vf.astype(jnp.float32),
        segment_ids=SegmentIds(q=q_seg, kv=kv_seg.astype(jnp.int32)),
        causal=True,
        sm_scale=1.0,  # folded into q
    )
    # gather the real rows back out: [B, Hq, T, D]
    outT = jax.vmap(lambda o, r: o[:, r])(out, rows)
    return outT.transpose(0, 2, 1, 3).astype(q.dtype)  # [B, T, Hq, D]


def blockwise_prefill_continuation(
    q: jax.Array,  # [B, T, Hq, D] chunk queries (positions start..start+T)
    cache_k: jax.Array,  # one layer; layout per meta.head_major
    cache_v: jax.Array,
    meta: PagedAttnMeta,
    *,
    scale: float,
    sliding_window: int | None = None,
    window_gate: jax.Array | None = None,  # traced per-layer window on/off
    logits_softcap: float | None = None,
    kv_block: int = 1024,
) -> jax.Array:
    """Blockwise (flash-style) continuation-chunk attention for LONG spans.

    The dense gather path materializes [B, Hq, T, S] scores — at 32k span
    that is gigabytes per layer; the right-aligned flash trick pads queries
    to the span (quadratic waste past ~4k). This op scans the span in
    `kv_block`-sized key blocks with an online-softmax combine, so peak
    memory is O(T * kv_block) regardless of context length (the 32k-prefill
    answer flagged in PERF.md; same recurrence as parallel/ring_attention.py
    but sequential over the local paged pool instead of over a mesh axis).
    """
    from mistralrs_tpu.ops.attention import block_attend, finalize_flash, flash_combine

    B, T, Hq, D = q.shape
    hm = getattr(meta, "head_major", False)
    # int8 pools arrive as (payload, scale) tuples; each block's pages are
    # gathered AND dequantized per kv_block, so the bf16 transient is
    # O(kv_block) not O(span) — this is what lets 64k int8-KV compile
    # (the one-shot gather's [B,Hkv,span,D] bf16 copy is ~1.1 GB there).
    kv_quant = isinstance(cache_k, tuple)
    pool_k = cache_k[0] if kv_quant else cache_k
    page = pool_k.shape[2] if hm else pool_k.shape[1]
    Hkv = pool_k.shape[0] if hm else pool_k.shape[2]
    G = Hq // Hkv
    MP = meta.block_tables.shape[1]
    ppb = max(kv_block // page, 1)
    nb = -(-MP // ppb)
    pad_mp = nb * ppb
    tables = meta.block_tables
    if pad_mp != MP:
        tables = jnp.pad(tables, ((0, 0), (0, pad_mp - MP)))
    blk = ppb * page
    q_ids = (meta.kv_lens - T)[:, None] + jnp.arange(T)[None]  # [B, T]
    qg = (q.astype(jnp.float32) * scale).reshape(B, T, Hkv, G, D)

    def body(carry, b):
        tb = jax.lax.dynamic_slice_in_dim(tables, b * ppb, ppb, axis=1)
        if kv_quant:
            k, v = gather_paged_kv_q(cache_k, cache_v, tb, head_major=hm,
                                     dtype=q.dtype)
        else:
            k, v = gather_paged_kv(cache_k, cache_v, tb, head_major=hm)
        if hm:  # [Hkv, B, blk, D] -> [B, blk, Hkv, D]
            k = k.transpose(1, 2, 0, 3)
            v = v.transpose(1, 2, 0, 3)
        kv_ids = b * blk + jnp.arange(blk)  # [blk]
        keep = kv_ids[None, None, :] <= q_ids[:, :, None]  # [B, T, blk]
        keep &= kv_ids[None, None, :] < meta.kv_lens[:, None, None]
        if sliding_window is not None:
            wkeep = kv_ids[None, None, :] > q_ids[:, :, None] - sliding_window
            if window_gate is not None:  # per-layer alternation (gemma2)
                wkeep = wkeep | jnp.logical_not(window_gate)
            keep &= wkeep
        blkstats = block_attend(qg, k.astype(jnp.float32), v, keep,
                                logits_softcap=logits_softcap)
        return flash_combine(*carry, *blkstats), None

    m0 = jnp.full((B, Hkv, G, T), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hkv, G, T), jnp.float32)
    acc0 = jnp.zeros((B, T, Hkv, G, D), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(nb))
    return finalize_flash(l, acc).astype(q.dtype)


def _pool_leaves(cache: PagedKVCache) -> dict[str, jax.Array]:
    """The cache's page-indexed arrays (payloads + quant scales if any);
    every leaf shares the same page axis (cache.page_axis). Combined pools
    have a single leaf (k holds interleaved K/V). Split pools: each value
    is a TUPLE of per-group arrays (same page axis per part)."""
    leaves = {"k": cache.k}
    if not cache.combined:
        leaves["v"] = cache.v
    if cache.quantized:
        leaves["k_scale"] = cache.k_scale
        leaves["v_scale"] = cache.v_scale
    return leaves


def _rebuild(cache: PagedKVCache, leaves: dict[str, jax.Array]) -> PagedKVCache:
    return PagedKVCache(k=leaves["k"], v=leaves.get("v"),
                        k_scale=leaves.get("k_scale"),
                        v_scale=leaves.get("v_scale"),
                        head_major=cache.head_major, splits=cache.splits)


def copy_pages(cache: PagedKVCache, src, dst) -> PagedKVCache:
    """COW page copies, layout-aware (ref cache_engine.rs copy :205)."""
    src = jnp.asarray(src, jnp.int32)
    dst = jnp.asarray(dst, jnp.int32)
    ax = cache.page_axis

    def cp(arr):
        if ax == 2:
            return arr.at[:, :, dst].set(arr[:, :, src])
        return arr.at[:, dst].set(arr[:, src])

    out = {name: jax.tree.map(cp, arr)
           for name, arr in _pool_leaves(cache).items()}
    return _rebuild(cache, out)


def dataclasses_replace_cache(cache: PagedKVCache, k, v) -> PagedKVCache:
    return PagedKVCache(k=k, v=v, k_scale=cache.k_scale,
                        v_scale=cache.v_scale, head_major=cache.head_major,
                        splits=cache.splits)


def resplit_cache(cache: PagedKVCache, new_splits: tuple | None) -> PagedKVCache:
    """Re-partition a (split or unsplit) pool's layer axis to `new_splits`
    (None = merge back to one [L] array) — KV content preserved. Used when
    re_isq regroups the scan structure under a split pool."""
    if not cache.is_split and new_splits is None:
        return cache

    def redo(field):
        if field is None:
            return None
        full = (jnp.concatenate(field, axis=0) if isinstance(field, tuple)
                else field)
        if new_splits is None:
            return full
        out, off = [], 0
        for s in new_splits:
            out.append(jax.lax.slice_in_dim(full, off, off + s, axis=0))
            off += s
        return tuple(out)

    return PagedKVCache(k=redo(cache.k), v=redo(cache.v),
                        k_scale=redo(cache.k_scale),
                        v_scale=redo(cache.v_scale),
                        head_major=cache.head_major,
                        splits=None if new_splits is None
                        else tuple(new_splits))


def swap_out_pages(cache: PagedKVCache, pages: list[int]) -> tuple:
    """Copy the named pages' K/V to host memory (ref cache_engine.rs
    swap_out :191-203 / swap_blocks D2H). Returns a tuple of host arrays
    (k, v[, k_scale, v_scale]) with a leading [n_pages] axis in the pool's
    layout order. Split pools concatenate parts back to full-[L] host
    arrays so the swap format is layout-independent."""
    import numpy as _np

    idx = jnp.asarray(pages, jnp.int32)
    ax = cache.page_axis

    def grab(arr):
        if isinstance(arr, tuple):
            return _np.concatenate([grab(a) for a in arr], axis=0)
        return _np.asarray(arr[:, :, idx] if ax == 2 else arr[:, idx])

    return tuple(grab(arr) for arr in _pool_leaves(cache).values())


def swap_in_pages(cache: PagedKVCache, host_kv: tuple, pages: list[int]) -> PagedKVCache:
    """Write host K/V (from swap_out_pages) into the named destination pages
    (ref cache_engine.rs swap_in :177-189 / swap_blocks H2D)."""
    idx = jnp.asarray(pages, jnp.int32)
    ax = cache.page_axis

    def put(arr, host):
        if isinstance(arr, tuple):
            out, off = [], 0
            for a in arr:
                out.append(put(a, host[off : off + a.shape[0]]))
                off += a.shape[0]
            return tuple(out)
        h = jnp.asarray(host, arr.dtype)
        if ax == 2:
            return arr.at[:, :, idx].set(h)
        return arr.at[:, idx].set(h)

    out = {name: put(arr, host)
           for (name, arr), host in zip(_pool_leaves(cache).items(), host_kv)}
    return _rebuild(cache, out)
