"""Sliding-window / softcapped flash prefill via the Pallas splash kernel.

The plain flash prefill path (models/decoder._use_flash_prefill) bows out
when the model needs a logit softcap (gemma2) or the sliding window clips
inside the chunk (long first chunks on mistral-family windows) — those
chunks fall back to masked dense attention that materializes [B, Hq, T, T]
scores. SplashAttention (jax.experimental splash_attention) covers both:
static LocalMask/CausalMask structure, fused softcap, and MQA grouping so
GQA needs no k/v repeat. Reference behavior anchor: the masked SDPA in
mistral.rs layers.rs ScaledDotProductAttention + layers_masker.rs sliding
window (the reference has no fused windowed prefill at all).

Per-layer window alternation (gemma2) is handled with one lax.cond between
the windowed and full kernels — both compile once under the layer scan.

Opt-in via MISTRALRS_SPLASH=1 until validated on the real toolchain
(tests/test_tpu_paths.py::test_splash_prefill_on_chip; interpret-mode
parity in tests/test_ops.py runs on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.cache
def _kernels(T: int, G: int, window: int | None, softcap: float | None,
              interpret: bool):
    """(windowed, full) splash MQA kernels for a [T, T] first chunk with G
    query heads per kv head. Masks are static per shape; cached per trace."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    blk = min(512, T)
    sizes = sk.BlockSizes(block_q=blk, block_kv=blk)

    def make(mask):
        return sk.make_splash_mqa_single_device(
            sm.MultiHeadMask([mask] * G),
            block_sizes=sizes,
            attn_logits_soft_cap=softcap,
            interpret=interpret,
        )

    full = make(sm.CausalMask((T, T)))
    if window is None:
        return full, full
    # repo window convention (ops/paged_attention.py:191): keep kv iff
    # kv > q - w  <=>  q - (w-1) <= kv  => LocalMask left = w - 1
    win = make(sm.LocalMask((T, T), (window - 1, 0), 0))
    return win, full


def splash_prefill(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, T, Hkv, D]
    v: jax.Array,
    *,
    scale: float,
    sliding_window: int | None = None,
    logits_softcap: float | None = None,
    use_win: jax.Array | None = None,  # traced per-layer bool (alternation)
    interpret: bool = False,
) -> jax.Array:
    """First-chunk prefill attention (context == chunk). Returns
    [B, T, Hq, D]. The kernel does not scale q, so scale is folded in here;
    softcap then applies to the scaled logits — same order as
    ops/attention.sdpa."""
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    qs = (q * jnp.asarray(scale, q.dtype)).reshape(B, T, Hkv, G, D)
    qs = qs.transpose(0, 2, 3, 1, 4)  # [B, Hkv, G, T, D]
    kt = k.transpose(0, 2, 1, 3)  # [B, Hkv, T, D]
    vt = v.transpose(0, 2, 1, 3)
    win_k, full_k = _kernels(T, G, sliding_window, logits_softcap, interpret)
    vmapped_win = jax.vmap(jax.vmap(win_k))
    vmapped_full = jax.vmap(jax.vmap(full_k))
    if use_win is None:
        out = (vmapped_win if sliding_window is not None else vmapped_full)(
            qs, kt, vt)
    else:
        out = jax.lax.cond(
            use_win,
            lambda a, b, c: vmapped_win(a, b, c),
            lambda a, b, c: vmapped_full(a, b, c),
            qs, kt, vt,
        )
    # [B, Hkv, G, T, D] -> [B, T, Hq, D]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, Hq, D).astype(q.dtype)
