"""Quantized `Linear` device formats for GGUF weights.

Reference parity: mistralrs-quant `GgufMatMul` (QMatMul over k-quant blocks)
— the packed weights stay packed in device memory and are dequantized inside
the matmul, which is the whole HBM-bandwidth win (SURVEY.md §7 hard part 2).

Device layouts (chosen for TPU kernels; load-time converted from GGUF).
All Pallas-served formats are stored K-MAJOR (contraction dim on sublanes,
`out` on lanes) so kernel tiles satisfy the (8,128) constraints with no
in-kernel transposes and the dequantized tile feeds the MXU directly:
- kind "gguf_q4k"  (Q4_K): per 256-elem super-block along `in`:
    qs     uint8 [in/2, out]   packed nibbles (ggml chunk order along in)
    scale  bf16  [in/32, out]  d * 6-bit sub-scale   (precomputed)
    minv   bf16  [in/32, out]  dmin * 6-bit sub-min  (precomputed)
  w[256*b + 64*c + j, o] from nibble lo/hi of byte row 128*b + 32*c + j;
  the +12.5% bytes vs the 144-byte wire format buys a shift/and-only
  kernel inner loop.
- kind "gguf_q6k"  (Q6_K): ql nibbles + qh 2-bit planes, per-16 sub-scales:
    ql     uint8 [out, nblk, 64]   per 128-half packed low nibbles
    qh     uint8 [out, nblk, 32]   packed 2-bit highs
    scale  bf16  [out, nblk, 16]   d * int8 sub-scale (per 16 elems)
  (packed as [out, nblk(2 halves merged)]: we keep halves explicit in nblk
  axis by storing nblk = elems/128 half-blocks.)
- kind "gguf_q8_0" (Q8_0): q int8 [in, out], scale bf16 [in/32, out].
- anything else: dequantized to bf16 at load (kind "dense") — correct but
  pays full bf16 HBM traffic; native kernels are added format by format.

Forwards here are the jnp reference (dequant -> matmul) used on CPU and as
the numerics baseline; ops/quant_matmul.py swaps in the fused Pallas kernel
on TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mistralrs_tpu.gguf.reader import GGMLType
from mistralrs_tpu.quant import kquants
from mistralrs_tpu.quant.qlinear import Linear, make_dense, register_kind


# ----------------------------------------------------------------- packers


def pack_q4k(raw: np.ndarray, out_features: int, in_features: int, dtype=jnp.bfloat16) -> Linear:
    """GGUF Q4_K wire blocks -> K-major device layout. raw: uint8 of (out, in).

    Nibble packing is *globally paired*: byte row r holds element r (lo) and
    element r + in/2 (hi). The kernel's unpack is then two relayout-free
    block ops (mask / shift) whose halves multiply against contiguous x and
    scale slices — no sublane interleave (ops/quant_matmul.py)."""
    nblk = in_features // 256
    b = raw.reshape(out_features, nblk, 144)
    d = b[:, :, 0:2].copy().view(np.float16).astype(np.float32)  # [out, nblk, 1]
    dmin = b[:, :, 2:4].copy().view(np.float16).astype(np.float32)
    sc, mn = kquants._unpack_scales_k4(b[:, :, 4:16])  # [out, nblk, 8] uint8
    qs = b[:, :, 16:144]  # [out, nblk, 128]
    scale = d * sc.astype(np.float32)  # [out, nblk, 8]
    minv = dmin * mn.astype(np.float32)
    # wire order -> element-order nibble matrix V [in, out]
    qs4 = qs.reshape(out_features, nblk, 4, 32)
    v = np.empty((out_features, nblk, 4, 2, 32), np.uint8)
    v[..., 0, :] = qs4 & 0xF  # elements 256b + 64c + j
    v[..., 1, :] = qs4 >> 4  # elements 256b + 64c + 32 + j
    v = v.reshape(out_features, in_features).T  # [in, out]
    half = in_features // 2
    qs_t = np.ascontiguousarray(v[:half] | (v[half:] << 4))
    scale_t = np.ascontiguousarray(scale.transpose(1, 2, 0).reshape(nblk * 8, out_features))
    minv_t = np.ascontiguousarray(minv.transpose(1, 2, 0).reshape(nblk * 8, out_features))
    return Linear(
        kind="gguf_q4k",
        shape=(in_features, out_features),
        data={
            "qs": jnp.asarray(qs_t),
            "scale": jnp.asarray(scale_t, dtype),
            "minv": jnp.asarray(minv_t, dtype),
        },
    )


def pack_q6k(raw: np.ndarray, out_features: int, in_features: int, dtype=jnp.bfloat16) -> Linear:
    """GGUF Q6_K wire blocks -> device layout (half-blocks of 128)."""
    nblk = in_features // 256
    b = raw.reshape(out_features, nblk, 210)
    ql = b[:, :, 0:128].reshape(out_features, nblk * 2, 64)
    qh = b[:, :, 128:192].reshape(out_features, nblk * 2, 32)
    scales = b[:, :, 192:208].view(np.int8).astype(np.float32).reshape(out_features, nblk * 2, 8)
    d = b[:, :, 208:210].copy().view(np.float16).astype(np.float32)  # [out, nblk, 1]
    d2 = np.repeat(d, 2, axis=1)  # per half-block
    scale = d2 * scales  # [out, 2*nblk, 8] — 8 sub-scales of 16 elems per half
    return Linear(
        kind="gguf_q6k",
        shape=(in_features, out_features),
        data={
            "ql": jnp.asarray(ql),
            "qh": jnp.asarray(qh),
            "scale": jnp.asarray(scale, dtype),
        },
    )


def pack_q8_0(raw: np.ndarray, out_features: int, in_features: int, dtype=jnp.bfloat16) -> Linear:
    nblk = in_features // 32
    b = raw.reshape(out_features, nblk, 34)
    d = b[:, :, 0:2].copy().view(np.float16).astype(np.float32)[:, :, 0]  # [out, nblk]
    q = b[:, :, 2:34].view(np.int8).reshape(out_features, in_features)
    return Linear(
        kind="gguf_q8_0",
        shape=(in_features, out_features),
        data={
            "q": jnp.asarray(np.ascontiguousarray(q.T)),
            "scale": jnp.asarray(np.ascontiguousarray(d.T), dtype),
        },
    )


PACKERS = {
    GGMLType.Q4_K: pack_q4k,
    GGMLType.Q6_K: pack_q6k,
    GGMLType.Q8_0: pack_q8_0,
}


def linear_from_gguf(
    raw: np.ndarray, gtype: GGMLType, shape: tuple[int, ...], dtype=jnp.bfloat16
) -> Linear:
    """Build a Linear from a GGUF weight tensor (shape = (out, in) numpy order)."""
    out_f, in_f = shape
    if gtype in PACKERS and in_f % 256 == 0:
        return PACKERS[gtype](raw, out_f, in_f, dtype)
    # fallback: dequantize to dense (transposed to (in, out))
    w = kquants.dequantize(raw, gtype, shape)
    return make_dense(jnp.asarray(np.ascontiguousarray(w.T), dtype))


# ------------------------------------------------------- dequant (device jnp)


def dequant_q4k_weights(lin: Linear, dtype) -> jax.Array:
    """[out, in] dequantized — reference path; the Pallas kernel fuses this.

    Paired layout: byte row r = (element r) | (element r + in/2) << 4."""
    qs = lin.data["qs"]  # [in/2, out] uint8, K-major paired
    in_half, out_f = qs.shape
    lo = (qs & 0xF).astype(dtype)  # elements [0, in/2)
    hi = (qs >> 4).astype(dtype)  # elements [in/2, in)
    q = jnp.concatenate([lo, hi], axis=0)  # [in, out] element order
    scale = jnp.repeat(lin.data["scale"].astype(dtype), 32, axis=0)  # [in, out]
    minv = jnp.repeat(lin.data["minv"].astype(dtype), 32, axis=0)
    w_t = q * scale - minv  # [in, out]
    return w_t.T


def dequant_q6k_weights(lin: Linear, dtype) -> jax.Array:
    ql = lin.data["ql"]  # [out, nhalf, 64]
    qh = lin.data["qh"]  # [out, nhalf, 32]
    out_f, nhalf, _ = ql.shape
    l1 = (ql[:, :, 0:32] & 0xF).astype(jnp.int32)
    l2 = (ql[:, :, 32:64] & 0xF).astype(jnp.int32)
    l3 = (ql[:, :, 0:32] >> 4).astype(jnp.int32)
    l4 = (ql[:, :, 32:64] >> 4).astype(jnp.int32)
    h = qh.astype(jnp.int32)
    q1 = l1 | (((h >> 0) & 3) << 4)
    q2 = l2 | (((h >> 2) & 3) << 4)
    q3 = l3 | (((h >> 4) & 3) << 4)
    q4 = l4 | (((h >> 6) & 3) << 4)
    q = jnp.stack([q1, q2, q3, q4], axis=2) - 32  # [out, nhalf, 4, 32]
    scale = lin.data["scale"].astype(dtype).reshape(out_f, nhalf, 4, 2)
    scale = jnp.repeat(scale, 16, axis=-1).reshape(out_f, nhalf, 4, 32)
    w = q.astype(dtype) * scale
    return w.reshape(out_f, nhalf * 128)


def dequant_q8_0_weights(lin: Linear, dtype) -> jax.Array:
    q = lin.data["q"]  # [in, out] int8, K-major
    in_f, out_f = q.shape
    scale = jnp.repeat(lin.data["scale"].astype(dtype), 32, axis=0)  # [in, out]
    return (q.astype(dtype) * scale).T


DEQUANT_WEIGHTS = {
    "gguf_q4k": dequant_q4k_weights,
    "gguf_q6k": dequant_q6k_weights,
    "gguf_q8_0": dequant_q8_0_weights,
}


# ----------------------------------------------------------------- forwards


def _ref_forward(lin: Linear, x: jax.Array) -> jax.Array:
    w = DEQUANT_WEIGHTS[lin.kind](lin, x.dtype)  # [out, in]
    return jnp.dot(x, w.T)


_USE_PALLAS = None


def _pallas_available() -> bool:
    global _USE_PALLAS
    if _USE_PALLAS is None:
        _USE_PALLAS = jax.default_backend() == "tpu"
    return _USE_PALLAS


@register_kind("gguf_q4k")
def _q4k_forward(lin: Linear, x: jax.Array) -> jax.Array:
    if _pallas_available():
        from mistralrs_tpu.ops.quant_matmul import q4k_matmul

        return q4k_matmul(lin, x)
    return _ref_forward(lin, x)


@register_kind("gguf_q6k")
def _q6k_forward(lin: Linear, x: jax.Array) -> jax.Array:
    return _ref_forward(lin, x)


@register_kind("gguf_q8_0")
def _q8_0_forward(lin: Linear, x: jax.Array) -> jax.Array:
    if _pallas_available():
        from mistralrs_tpu.ops.quant_matmul import q8_0_matmul

        return q8_0_matmul(lin, x)
    return _ref_forward(lin, x)
