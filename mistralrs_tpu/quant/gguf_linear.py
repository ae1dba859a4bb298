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


def _q6k_int_values(raw: np.ndarray, out_f: int, in_f: int) -> tuple[np.ndarray, np.ndarray]:
    """Q6_K wire blocks -> (q uint8 [out, in] 6-bit values in element order,
    scale f32 [out, in/16] per-16 sub-scales d*int8)."""
    nblk = in_f // 256
    b = raw.reshape(out_f, nblk, 210)
    ql = b[..., 0:128].reshape(out_f, nblk, 2, 64)
    qh = b[..., 128:192].reshape(out_f, nblk, 2, 32)
    sc = b[..., 192:208].view(np.int8).astype(np.float32)  # [out, nblk, 16]
    d = b[..., 208:210].copy().view(np.float16).astype(np.float32)  # [out, nblk, 1]
    lo = np.stack(
        [ql[..., 0:32] & 0xF, ql[..., 32:64] & 0xF, ql[..., 0:32] >> 4, ql[..., 32:64] >> 4],
        axis=3,
    )  # [out, nblk, 2, 4, 32]
    hi = np.stack([(qh >> s) & 3 for s in (0, 2, 4, 6)], axis=3)
    q = (lo | (hi << 4)).reshape(out_f, in_f)
    scale = d * sc  # [out, nblk, 16] per-16 groups in element order
    return q, scale.reshape(out_f, in_f // 16)


def q6k_chunk_size(in_features: int) -> int | None:
    """Largest span size G with in/4 % G == 0 (kernel tiles 4 spans of G)."""
    for g in (512, 256, 128, 64):
        if (in_features // 4) % g == 0:
            return g
    return None


def pack_q6k(raw: np.ndarray, out_features: int, in_features: int, dtype=jnp.bfloat16) -> Linear:
    """GGUF Q6_K wire blocks -> chunked K-major device layout.

    Device element order is PERMUTED so every kernel k-step reads one
    contiguous block of each array (ops/quant_matmul.py q6k kernel). With
    chunk span G and Kq = in/4, permuted position p = c*4G + j*G + t maps to
    original element j*Kq + c*G + t (chunk c, span j of 4, offset t):
      ql    uint8 [in/2, out]  chunk rows [2cG,2cG+2G): first G rows pack
            lownib(span0)|lownib(span2)<<4, next G rows span1|span3<<4
      qh    uint8 [in/4, out]  chunk rows [cG,cG+G): 2-bit highs of spans
            0..3 at bit offsets 0/2/4/6
      scale dtype [in/16, out] per-16 sub-scales in permuted order
      perm / inv_perm int32 [in]: x is gathered by perm at runtime; inv_perm
            restores element order for the dequant reference path.
    w = scale*(q-32); the -32*scale term is applied outside the kernel as
    xsum16 @ scale (1/16th-size XLA matmul), like the Q4_K min-term."""
    G = q6k_chunk_size(in_features)
    if G is None:
        raise ValueError(f"in_features {in_features} not packable for q6k")
    q, s16 = _q6k_int_values(raw, out_features, in_features)
    K, O = in_features, out_features
    Kq, C = K // 4, K // (4 * G)
    qT = q.T  # [K, O]
    ln = (qT & 0xF).reshape(4, C, G, O)  # [span j, chunk c, t, O]
    hb = (qT >> 4).reshape(4, C, G, O)
    qlc = np.concatenate([ln[0] | (ln[2] << 4), ln[1] | (ln[3] << 4)], axis=1)  # [C, 2G, O]
    qhc = hb[0] | (hb[1] << 2) | (hb[2] << 4) | (hb[3] << 6)  # [C, G, O]
    sT = s16.T.reshape(4, C, G // 16, O).transpose(1, 0, 2, 3).reshape(K // 16, O)
    j_idx, c_idx, t_idx = np.meshgrid(
        np.arange(4), np.arange(C), np.arange(G), indexing="ij"
    )
    # perm in p-order: p = c*4G + j*G + t -> orig j*Kq + c*G + t
    perm = (j_idx * Kq + c_idx * G + t_idx).transpose(1, 0, 2).reshape(K)
    return Linear(
        kind="gguf_q6k",
        shape=(in_features, out_features),
        data={
            "ql": jnp.asarray(np.ascontiguousarray(qlc.reshape(K // 2, O))),
            "qh": jnp.asarray(np.ascontiguousarray(qhc.reshape(K // 4, O))),
            "scale": jnp.asarray(sT, dtype),
            "perm": jnp.asarray(perm, jnp.int32),
            "inv_perm": jnp.asarray(np.argsort(perm), jnp.int32),
        },
        meta=G,  # chunk span (static; hashable for jit)
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
    """[out, in] in element order — inverts the chunked permuted layout
    (pack_q6k); the Pallas kernel fuses the same unpack."""
    ql = lin.data["ql"]  # [in/2, out] chunked
    qh = lin.data["qh"]  # [in/4, out]
    K2, out_f = ql.shape
    K = K2 * 2
    G = lin.meta
    C = K // (4 * G)
    qlc = ql.reshape(C, 2, G, out_f).astype(jnp.int32)
    h = qh.reshape(C, G, out_f).astype(jnp.int32)
    q0 = (qlc[:, 0] & 0xF) | ((h & 3) << 4)
    q1 = (qlc[:, 1] & 0xF) | (((h >> 2) & 3) << 4)
    q2 = (qlc[:, 0] >> 4) | (((h >> 4) & 3) << 4)
    q3 = (qlc[:, 1] >> 4) | ((h >> 6) << 4)
    q_perm = jnp.stack([q0, q1, q2, q3], axis=1).reshape(K, out_f) - 32
    scale = jnp.repeat(lin.data["scale"].astype(dtype), 16, axis=0)  # [K, out] permuted
    w_perm = q_perm.astype(dtype) * scale
    w_elem = jnp.take(w_perm, lin.data["inv_perm"], axis=0)  # [in, out]
    return w_elem.T


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
    y = jnp.dot(x, w.T)
    b = lin.data.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


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
    if _pallas_available():
        from mistralrs_tpu.ops.quant_matmul import q6k_matmul

        return q6k_matmul(lin, x)
    return _ref_forward(lin, x)


@register_kind("gguf_q8_0")
def _q8_0_forward(lin: Linear, x: jax.Array) -> jax.Array:
    if _pallas_available():
        from mistralrs_tpu.ops.quant_matmul import q8_0_matmul

        return q8_0_matmul(lin, x)
    return _ref_forward(lin, x)
