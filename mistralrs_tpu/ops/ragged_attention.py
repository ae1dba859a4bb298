"""Unified ragged paged attention (vLLM-TPU kernel) — staged adoption.

`jax.experimental.pallas.ops.tpu.ragged_paged_attention` serves mixed
prefill + decode in ONE kernel over a combined KV-page pool
([pages, page_size, 2*Hkv, D], K at even / V at odd head indices), with
native sliding-window and softcap masking. Adopting it as the serving
attention backend would collapse the prefill/continuation/decode dispatch
zoo (models/decoder.py) into one call — the reference's paged_attention
v1/v2 + prefill split (SURVEY §2.2) unified.

Stage 1 (this module): shape/convention adapters from this repo's layouts
to the kernel's, semantic parity tests of the kernel's reference
implementation against ops/attention.sdpa (window edge, softcap order,
GQA), an on-chip kernel test, and a hardware A/B vs the current decode
paths (scripts/ragged_ab.py). Stage 2 (only if the A/B wins): a "combined"
PagedKVCache layout and the engine flattening (cu_q_lens) plumbing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def write_combined_kv(
    pool: jax.Array,  # one layer [P, page, 2*Hkv, D] (K even / V odd)
    new_k: jax.Array,  # [B, T, Hkv, D]
    new_v: jax.Array,
    slot_mapping: jax.Array,  # [B, T]
) -> jax.Array:
    """reshape_and_cache into the combined pool (padding slots hit page 0)."""
    P, page, H2, D = pool.shape
    B, T, H, _ = new_k.shape
    idx = slot_mapping.reshape(-1)
    flat = pool.reshape(P * page, H2, D)
    inter = jnp.stack([new_k, new_v], axis=3).reshape(B * T, H2, D)
    return flat.at[idx].set(inter.astype(pool.dtype), mode="drop").reshape(
        pool.shape)


def split_combined(pool: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Combined pool -> (k, v) token-major views [.., page, Hkv, D] (strided
    head slices; XLA lowers these without a copy on the gather paths)."""
    return pool[..., 0::2, :], pool[..., 1::2, :]


def combine_kv(k_hm: jax.Array, v_hm: jax.Array) -> jax.Array:
    """Head-major per-layer pools [Hkv, P, page, D] -> combined kernel pool
    [P, page, 2*Hkv, D] (K even / V odd). A materializing transpose — stage-1
    test/bench helper only; stage 2 stores the pool in this layout."""
    k = k_hm.transpose(1, 2, 0, 3)  # [P, page, Hkv, D]
    v = v_hm.transpose(1, 2, 0, 3)
    P, page, Hkv, D = k.shape
    return jnp.stack([k, v], axis=3).reshape(P, page, 2 * Hkv, D)


def flatten_queries(q: jax.Array, q_lens: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Padded per-seq queries [B, T, Hq, D] + per-seq valid lengths [B] ->
    (flat [B*T, Hq, D], cu_q_lens [B+1]) in the kernel's packed convention.

    The kernel reads rows [cu[i], cu[i+1]) per sequence; padding rows must
    therefore be squeezed out, not masked: rows are stably partitioned so
    each sequence's valid rows are contiguous in order."""
    B, T, Hq, D = q.shape
    valid = (jnp.arange(T)[None, :] < q_lens[:, None]).reshape(-1)  # [B*T]
    # stable partition: valid rows first, in order (invalid rows gather row 0
    # into the tail, past every cu_q_lens span — the kernel never reads them)
    idx = jnp.nonzero(valid, size=B * T, fill_value=0)[0]
    out = q.reshape(B * T, Hq, D)[idx]
    cu = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                          jnp.cumsum(q_lens.astype(jnp.int32))])
    return out, cu


def pack_ragged_meta(q: jax.Array, meta, page: int):
    """Padded PagedAttnMeta batch -> the kernel's ragged convention:
    (q_flat, cu_q_lens, kv_lens, num_seqs, q_lens).

    q_lens counts each row's REAL tokens (padding slots point into page 0).
    meta.kv_lens uses the padded-width convention (kv_len = start + T so the
    SDPA paths get q_offset = kv_lens - T); the kernel derives query
    positions as kv_len - q_len + i from the UNPADDED q_len, so the padding
    (T - q_len) must come off kv_lens or real queries shift up and attend
    unwritten slots."""
    B, T, _, _ = q.shape
    q_lens = jnp.sum(meta.slot_mapping // page != 0, axis=1).astype(jnp.int32)
    num_seqs = jnp.sum(meta.active > 0).astype(jnp.int32)[None]
    q_flat, cu = flatten_queries(q, q_lens)
    kv_lens = jnp.maximum(meta.kv_lens.astype(jnp.int32) - (T - q_lens), 1)
    return q_flat, cu, kv_lens, num_seqs, q_lens


def ragged_attention_padded(
    q: jax.Array,  # [B, T, Hq, D] padded per-row queries
    pool: jax.Array,  # combined per-layer pool [P, page, 2*Hkv, D]
    meta,  # PagedAttnMeta
    *,
    scale: float,
    sliding_window: int | None = None,
    logits_softcap: float | None = None,
    use_win: jax.Array | None = None,  # traced per-layer gate (alternation)
) -> jax.Array:
    """The decoder-facing call (MISTRALRS_ATTN_BACKEND=ragged, TPU): packs
    the padded batch into the kernel's ragged convention and scatters the
    output back. Padding tokens are identified by their page-0 slots; live
    rows precede padding rows in the static batch (pipeline/text.py row
    packing), which the kernel's num_seqs prefix contract requires."""
    B, T, Hq, D = q.shape
    page = pool.shape[1]
    q_flat, cu, kv_lens, num_seqs, q_lens = pack_ragged_meta(q, meta, page)

    def call(window):
        return ragged_attention(
            q_flat, pool, kv_lens, meta.block_tables, cu, num_seqs,
            scale=scale, sliding_window=window,
            logits_softcap=logits_softcap)

    if use_win is None or sliding_window is None:
        out_flat = call(sliding_window)
    else:
        out_flat = jax.lax.cond(
            use_win, lambda: call(sliding_window), lambda: call(None))
    # scatter back: packed row r -> its original (b, t); padding tokens zero
    valid = (jnp.arange(T)[None, :] < q_lens[:, None]).reshape(-1)
    dest = jnp.cumsum(valid.astype(jnp.int32)) - 1
    out = out_flat[jnp.where(valid, dest, 0)]
    out = jnp.where(valid[:, None, None], out, 0).astype(q.dtype)
    return out.reshape(B, T, Hq, D)


def ragged_attention(
    q_flat: jax.Array,  # [total_tokens, Hq, D]
    kv_pages: jax.Array,  # [P, page, 2*Hkv, D]
    kv_lens: jax.Array,  # i32 [B]
    page_indices: jax.Array,  # i32 [B, pages_per_seq]
    cu_q_lens: jax.Array,  # i32 [B+1]
    num_seqs: jax.Array,  # i32 [1]
    *,
    scale: float,
    sliding_window: int | None = None,
    logits_softcap: float | None = None,
) -> jax.Array:
    """The kernel call (TPU only — no interpret mode upstream).

    r3 finding: the kernel's default block heuristic fails to compile at
    serving shapes (B=16, 128+ pages/seq) on this toolchain. r4 (VERDICT
    #6): chunk the invocation explicitly — bound the per-grid-step KV
    window to <= 16 pages and queries to <= 64, and raise the VMEM budget;
    small shapes keep the upstream defaults (known-good on-chip)."""
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention,
    )

    pages_per_seq = page_indices.shape[1]
    kw = {}
    if pages_per_seq > 32:
        kw = dict(
            num_kv_pages_per_block=min(16, pages_per_seq),
            num_queries_per_block=min(64, max(8, q_flat.shape[0])),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return ragged_paged_attention(
        q_flat, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
        sm_scale=scale, sliding_window=sliding_window,
        soft_cap=logits_softcap, **kw,
    )
