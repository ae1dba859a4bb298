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


def q6k_perm(K: int, G: int) -> np.ndarray:
    """The q6k chunked-layout load permutation: packed position
    p = c*4G + j*G + t holds original element j*(K/4) + c*G + t. The single
    definition of the layout — the kernel, the packer, and bench's synthetic
    model builder all consume this."""
    C = K // (4 * G)
    j_idx, c_idx, t_idx = np.meshgrid(
        np.arange(4), np.arange(C), np.arange(G), indexing="ij"
    )
    return (j_idx * (K // 4) + c_idx * G + t_idx).transpose(1, 0, 2).reshape(K)


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
    q, s16 = _q6k_int_values(raw, out_features, in_features)
    return _pack_q6k_from_values(q, s16, out_features, in_features, dtype)


def _pack_q6k_from_values(q: np.ndarray, s16: np.ndarray, out_features: int,
                          in_features: int, dtype) -> Linear:
    """Pack 6-bit values (q [out, in] element order, 0..63; w = s*(q-32))
    + per-16 scales s16 [out, in/16] into the chunked q6k device layout.
    Also the Q3_K bridge (pack_q3k maps q3+28 onto this form)."""
    G = q6k_chunk_size(in_features)
    if G is None:
        raise ValueError(f"in_features {in_features} not packable for q6k")
    K, O = in_features, out_features
    Kq, C = K // 4, K // (4 * G)
    qT = q.T  # [K, O]
    ln = (qT & 0xF).reshape(4, C, G, O)  # [span j, chunk c, t, O]
    hb = (qT >> 4).reshape(4, C, G, O)
    qlc = np.concatenate([ln[0] | (ln[2] << 4), ln[1] | (ln[3] << 4)], axis=1)  # [C, 2G, O]
    qhc = hb[0] | (hb[1] << 2) | (hb[2] << 4) | (hb[3] << 6)  # [C, G, O]
    sT = s16.T.reshape(4, C, G // 16, O).transpose(1, 0, 2, 3).reshape(K // 16, O)
    perm = q6k_perm(K, G)
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


def pack_q5k(raw: np.ndarray, out_features: int, in_features: int, dtype=jnp.bfloat16) -> Linear:
    """GGUF Q5_K wire blocks -> K-major device layout (176 B / 256 elems).

    w = scale*(nib + 16*hbit) - minv. The nibble part reuses the Q4_K
    globally-paired layout exactly (qs/scale/minv identical roles), so the
    fused forward is the Q4_K kernel + a high-bit kernel (1 bit/elem):
      qs    uint8 [in/2, out]   paired nibbles (element r | element r+in/2)
      qh    uint8 [in/8, out]   PLANE-MAJOR bit-pack: row r bit j = high bit
            of element j*(in/8) + r, so plane j's k-tile reads contiguous
            x/scale slices at static offsets (no sublane interleave)
      scale bf16  [in/32, out]; minv bf16 [in/32, out]
    Ref: candle k-quant q5_K CUDA dequant consumed via
    mistralrs-quant/src/gguf.rs."""
    nblk = in_features // 256
    b = raw.reshape(out_features, nblk, 176)
    d = b[:, :, 0:2].copy().view(np.float16).astype(np.float32)
    dmin = b[:, :, 2:4].copy().view(np.float16).astype(np.float32)
    sc, mn = kquants._unpack_scales_k4(b[:, :, 4:16])  # [out, nblk, 8]
    qh = b[:, :, 16:48]  # [out, nblk, 32]
    qs = b[:, :, 48:176]
    scale = d * sc.astype(np.float32)
    minv = dmin * mn.astype(np.float32)
    # nibbles: wire order -> element order (same chunking as Q4_K)
    qs4 = qs.reshape(out_features, nblk, 4, 32)
    v = np.empty((out_features, nblk, 4, 2, 32), np.uint8)
    v[..., 0, :] = qs4 & 0xF
    v[..., 1, :] = qs4 >> 4
    v = v.reshape(out_features, in_features).T  # [in, out]
    half = in_features // 2
    qs_t = np.ascontiguousarray(v[:half] | (v[half:] << 4))
    # high bits: qh byte j bit (2c+h) -> element 256b + 32*(2c+h) + j
    shifts = np.arange(8, dtype=np.uint8)
    hb = ((qh[:, :, None, :] >> shifts[None, None, :, None]) & 1).astype(np.uint8)
    hb = hb.reshape(out_features, in_features).T  # [in, out] element order
    K8 = in_features // 8
    planes = hb.reshape(8, K8, out_features)
    qhp = np.zeros((K8, out_features), np.uint8)
    for j in range(8):
        qhp |= planes[j] << j
    scale_t = np.ascontiguousarray(scale.transpose(1, 2, 0).reshape(nblk * 8, out_features))
    minv_t = np.ascontiguousarray(minv.transpose(1, 2, 0).reshape(nblk * 8, out_features))
    return Linear(
        kind="gguf_q5k",
        shape=(in_features, out_features),
        data={
            "qs": jnp.asarray(qs_t),
            "qh": jnp.asarray(np.ascontiguousarray(qhp)),
            "scale": jnp.asarray(scale_t, dtype),
            "minv": jnp.asarray(minv_t, dtype),
        },
    )


def _pack_affine_q4(v: np.ndarray, scale32: np.ndarray, minv32: np.ndarray,
                    in_features: int, out_features: int, dtype) -> Linear:
    """Generic w = scale*q - minv with 4-bit q and per-32 scales -> the
    gguf_q4k device format (fused Q4_K Pallas kernel). v [out, in] values
    0..15 in element order; scale32/minv32 [out, in/32]."""
    vT = v.T  # [in, out]
    half = in_features // 2
    qs_t = np.ascontiguousarray(vT[:half] | (vT[half:] << 4))
    return Linear(
        kind="gguf_q4k",
        shape=(in_features, out_features),
        data={
            "qs": jnp.asarray(qs_t),
            "scale": jnp.asarray(np.ascontiguousarray(scale32.T), dtype),
            "minv": jnp.asarray(np.ascontiguousarray(minv32.T), dtype),
        },
    )


def _pack_affine_q5(v: np.ndarray, scale32: np.ndarray, minv32: np.ndarray,
                    in_features: int, out_features: int, dtype) -> Linear:
    """Generic 5-bit affine -> the gguf_q5k device format (fused kernel).
    v [out, in] values 0..31 in element order."""
    vT = v.T
    half = in_features // 2
    lo = (vT & 0xF).astype(np.uint8)
    qs_t = np.ascontiguousarray(lo[:half] | (lo[half:] << 4))
    hb = (vT >> 4).astype(np.uint8)  # [in, out] 0/1
    K8 = in_features // 8
    planes = hb.reshape(8, K8, out_features)
    qhp = np.zeros((K8, out_features), np.uint8)
    for j in range(8):
        qhp |= planes[j] << j
    return Linear(
        kind="gguf_q5k",
        shape=(in_features, out_features),
        data={
            "qs": jnp.asarray(qs_t),
            "qh": jnp.asarray(np.ascontiguousarray(qhp)),
            "scale": jnp.asarray(np.ascontiguousarray(scale32.T), dtype),
            "minv": jnp.asarray(np.ascontiguousarray(minv32.T), dtype),
        },
    )


def pack_q4_0(raw: np.ndarray, out_features: int, in_features: int, dtype=jnp.bfloat16) -> Linear:
    """Q4_0 rides the fused Q4_K kernel: w = d*(v-8) = d*v - 8d."""
    nblk = in_features // 32
    b = raw.reshape(out_features, nblk, 18)
    d = b[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]  # [out, nblk]
    qs = b[:, :, 2:18]
    v = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(out_features, in_features)
    return _pack_affine_q4(v, d, 8.0 * d, in_features, out_features, dtype)


def pack_q4_1(raw: np.ndarray, out_features: int, in_features: int, dtype=jnp.bfloat16) -> Linear:
    """Q4_1 rides the fused Q4_K kernel: w = d*v + m = d*v - (-m)."""
    nblk = in_features // 32
    b = raw.reshape(out_features, nblk, 20)
    d = b[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    m = b[:, :, 2:4].copy().view(np.float16).astype(np.float32)[..., 0]
    qs = b[:, :, 4:20]
    v = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(out_features, in_features)
    return _pack_affine_q4(v, d, -m, in_features, out_features, dtype)


def pack_q5_0(raw: np.ndarray, out_features: int, in_features: int, dtype=jnp.bfloat16) -> Linear:
    """Q5_0 rides the fused Q5_K kernel: w = d*(v-16) = d*v - 16d."""
    nblk = in_features // 32
    b = raw.reshape(out_features, nblk, 22)
    d = b[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    qh = b[:, :, 2:6].copy().view(np.uint32)[..., 0]  # [out, nblk]
    qs = b[:, :, 6:22]
    bits = ((qh[..., None] >> np.arange(32, dtype=np.uint32)) & 1).astype(np.uint8)
    v = np.concatenate([qs & 0xF, qs >> 4], axis=2) | (bits << 4)
    v = v.reshape(out_features, in_features)
    return _pack_affine_q5(v, d, 16.0 * d, in_features, out_features, dtype)


def pack_q5_1(raw: np.ndarray, out_features: int, in_features: int, dtype=jnp.bfloat16) -> Linear:
    """Q5_1 rides the fused Q5_K kernel: w = d*v + m."""
    nblk = in_features // 32
    b = raw.reshape(out_features, nblk, 24)
    d = b[:, :, 0:2].copy().view(np.float16).astype(np.float32)[..., 0]
    m = b[:, :, 2:4].copy().view(np.float16).astype(np.float32)[..., 0]
    qh = b[:, :, 4:8].copy().view(np.uint32)[..., 0]
    qs = b[:, :, 8:24]
    bits = ((qh[..., None] >> np.arange(32, dtype=np.uint32)) & 1).astype(np.uint8)
    v = np.concatenate([qs & 0xF, qs >> 4], axis=2) | (bits << 4)
    v = v.reshape(out_features, in_features)
    return _pack_affine_q5(v, d, -m, in_features, out_features, dtype)


def _q3k_values(raw: np.ndarray, out_f: int, in_f: int) -> tuple[np.ndarray, np.ndarray]:
    """Q3_K wire -> (q_signed+4 uint8 [out, in] element order (0..7),
    scale f32 [out, in/16])."""
    from mistralrs_tpu.quant import kquants as kq

    nblk = in_f // 256
    b = raw.reshape(out_f * nblk, 110)
    N = b.shape[0]
    hmask = b[:, 0:32]
    qs = b[:, 32:96].reshape(N, 2, 32)
    packed = b[:, 96:108]
    d = b[:, 108:110].copy().view(np.float16).astype(np.float32)
    lo4 = packed[:, 0:8] & 0xF
    hi4 = packed[:, 0:8] >> 4
    hi2 = packed[:, 8:12]
    high = np.empty((N, 16), np.uint8)
    for j in range(4):
        high[:, 4 * j : 4 * j + 4] = (hi2 >> (2 * j)) & 3
    sc = np.empty((N, 16), np.int32)
    sc[:, 0:8] = lo4.astype(np.int32) | (high[:, 0:8].astype(np.int32) << 4)
    sc[:, 8:16] = hi4.astype(np.int32) | (high[:, 8:16].astype(np.int32) << 4)
    sc = sc - 32
    shifts = np.arange(4, dtype=np.uint8)
    q = (qs[:, :, None, :] >> (2 * shifts)[None, None, :, None]) & 3
    q = q.reshape(N, 16, 16).astype(np.int32)
    mbits = np.empty((N, 16, 16), np.int32)
    for half in range(2):
        for j in range(4):
            msk = 1 << (half * 4 + j)
            chunk = (hmask.astype(np.int32) & msk) != 0
            mbits[:, half * 8 + 2 * j] = chunk[:, 0:16]
            mbits[:, half * 8 + 2 * j + 1] = chunk[:, 16:32]
    q = q - np.where(mbits, 0, 4) + 4  # 0..7 (true value - (-4))
    scale = d * sc.astype(np.float32)  # [N, 16] per-16
    return (q.reshape(out_f, in_f).astype(np.uint8),
            scale.reshape(out_f, in_f // 16))


def pack_q3k(raw: np.ndarray, out_features: int, in_features: int, dtype=jnp.bfloat16) -> Linear:
    """Q3_K rides the fused Q6_K kernel: w = s16*(q3-4) with q3 in 0..7 maps
    exactly onto the q6k form s16*(q6-32) via q6 = q3 + 28 (fits 6 bits)."""
    q3, s16 = _q3k_values(raw, out_features, in_features)
    return _pack_q6k_from_values(q3 + 28, s16, out_features, in_features, dtype)


def pack_q2k(raw: np.ndarray, out_features: int, in_features: int, dtype=jnp.bfloat16) -> Linear:
    """Q2_K packed-in-HBM layout (XLA dequant per forward; 2.6 bit/weight at
    rest instead of dense bf16 — a 7B Q2_K fits on one chip):
      q     uint8 [in/4, out]  quarter-plane-major: row r bits 2j hold
            element j*(in/4) + r
      scale bf16  [in/16, out]; minv bf16 [in/16, out]  (d*sc4, dmin*mn4)"""
    nblk = in_features // 256
    b = raw.reshape(out_features * nblk, 84)
    N = b.shape[0]
    scales = b[:, 0:16]
    qs = b[:, 16:80].reshape(N, 2, 32)
    d = b[:, 80:82].copy().view(np.float16).astype(np.float32)
    dmin = b[:, 82:84].copy().view(np.float16).astype(np.float32)
    shifts = np.arange(4, dtype=np.uint8)
    q = (qs[:, :, None, :] >> (2 * shifts)[None, None, :, None]) & 3
    q = q.reshape(N, 256).astype(np.uint8)
    sc = d * (scales & 0xF).astype(np.float32)  # [N, 16]
    mn = dmin * (scales >> 4).astype(np.float32)
    qT = q.reshape(out_features, in_features).T  # [in, out]
    K4 = in_features // 4
    planes = qT.reshape(4, K4, out_features)
    qp = np.zeros((K4, out_features), np.uint8)
    for j in range(4):
        qp |= planes[j] << (2 * j)
    return Linear(
        kind="gguf_q2k",
        shape=(in_features, out_features),
        data={
            "q": jnp.asarray(np.ascontiguousarray(qp)),
            "scale": jnp.asarray(
                np.ascontiguousarray(sc.reshape(out_features, in_features // 16).T), dtype),
            "minv": jnp.asarray(
                np.ascontiguousarray(mn.reshape(out_features, in_features // 16).T), dtype),
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
    GGMLType.Q5_K: pack_q5k,
    GGMLType.Q6_K: pack_q6k,
    GGMLType.Q8_0: pack_q8_0,
    GGMLType.Q4_0: pack_q4_0,
    GGMLType.Q4_1: pack_q4_1,
    GGMLType.Q5_0: pack_q5_0,
    GGMLType.Q5_1: pack_q5_1,
    GGMLType.Q2_K: pack_q2k,
    GGMLType.Q3_K: pack_q3k,
}

# minimum `in` divisibility per packer (block structure + device pairing)
_PACK_IN_MULTIPLE = {
    GGMLType.Q4_K: 256, GGMLType.Q5_K: 256, GGMLType.Q6_K: 256,
    GGMLType.Q2_K: 256, GGMLType.Q3_K: 256,
    GGMLType.Q8_0: 32,
    GGMLType.Q4_0: 64, GGMLType.Q4_1: 64,   # paired-nibble halves per 32
    GGMLType.Q5_0: 256, GGMLType.Q5_1: 256,  # 8 bit-planes x 32-scale align
}


def linear_from_gguf(
    raw: np.ndarray, gtype: GGMLType, shape: tuple[int, ...], dtype=jnp.bfloat16
) -> Linear:
    """Build a Linear from a GGUF weight tensor (shape = (out, in) numpy order)."""
    out_f, in_f = shape
    if gtype in PACKERS and in_f % _PACK_IN_MULTIPLE[gtype] == 0:
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


def dequant_q5k_weights(lin: Linear, dtype) -> jax.Array:
    """[out, in] — paired nibbles + plane-major high bits (pack_q5k)."""
    qs = lin.data["qs"]  # [in/2, out]
    qhp = lin.data["qh"]  # [in/8, out]
    in_half, out_f = qs.shape
    in_f = in_half * 2
    lo = (qs & 0xF).astype(jnp.int32)
    hi = (qs >> 4).astype(jnp.int32)
    q = jnp.concatenate([lo, hi], axis=0)  # [in, out] element order
    planes = [((qhp >> j) & 1).astype(jnp.int32) for j in range(8)]
    hb = jnp.concatenate(planes, axis=0)  # [in, out] element order
    scale = jnp.repeat(lin.data["scale"].astype(dtype), 32, axis=0)
    minv = jnp.repeat(lin.data["minv"].astype(dtype), 32, axis=0)
    w_t = (q + 16 * hb).astype(dtype) * scale - minv
    return w_t.T


def dequant_q2k_weights(lin: Linear, dtype) -> jax.Array:
    """[out, in] — quarter-plane-major 2-bit pack + per-16 scale/min."""
    qp = lin.data["q"]  # [in/4, out]
    planes = [((qp >> (2 * j)) & 3).astype(jnp.int32) for j in range(4)]
    q = jnp.concatenate(planes, axis=0)  # [in, out] element order
    scale = jnp.repeat(lin.data["scale"].astype(dtype), 16, axis=0)
    minv = jnp.repeat(lin.data["minv"].astype(dtype), 16, axis=0)
    return (q.astype(dtype) * scale - minv).T


def dequant_q8_0_gs_weights(lin: Linear, dtype) -> jax.Array:
    """[out, in] for the generalized per-gs int8 layout (meta = group
    size; wire Q8_0 is gs=32/meta None)."""
    gs = lin.meta or 32
    q = lin.data["q"]  # [in, out] int8, K-major
    scale = jnp.repeat(lin.data["scale"].astype(dtype), gs, axis=0)
    return (q.astype(dtype) * scale).T


def requant_q6k_to_q8(lin: Linear, gs: int = 64) -> Linear:
    """Near-lossless load-time requant of a Q6_K Linear to the int8 per-gs
    layout served by the Q8_0 kernels (r5, VERDICT r4 #2).

    Rationale: the Q6_K int8 kernel is issue-bound — 64 16-deep int8 dots
    + a two-plane unpack per k-step hold it at ~343 GB/s vs Q4_K's 460.
    Re-expressing w = s16*(q-32) as int8 with a per-gs absmax scale costs
    +21% bytes (1.0625 vs 0.875 B/elem at gs=64) but serves with ZERO
    unpack and gs-deep dots. Added quantization error: s_gs/2 where
    s_gs ~= max|w|_gs/127, i.e. ~4x SMALLER than Q6_K's own step s16
    (max|w|_16 ~= 32*s16 -> s_32 ~= s16/4) — measured in the distortion
    harness (scripts/ppl_distortion.py --rq8)."""
    K, O = lin.shape
    w = dequant_q6k_weights(lin, jnp.float32).T  # [in, out] f32
    wg = w.reshape(K // gs, gs, O)
    s = jnp.maximum(jnp.max(jnp.abs(wg), axis=1), 1e-12) / 127.0  # [K/gs, O]
    q = jnp.clip(jnp.round(wg / s[:, None, :]), -127, 127).astype(jnp.int8)
    data = {"q": q.reshape(K, O), "scale": s.astype(jnp.float32)}
    if "b" in lin.data:
        data["b"] = lin.data["b"]
    return Linear(kind="gguf_q8_0", shape=lin.shape, data=data, meta=gs)


DEQUANT_WEIGHTS = {
    "gguf_q4k": dequant_q4k_weights,
    "gguf_q5k": dequant_q5k_weights,
    "gguf_q6k": dequant_q6k_weights,
    "gguf_q8_0": dequant_q8_0_gs_weights,
    "gguf_q2k": dequant_q2k_weights,
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


def _maybe_unstack(lin: Linear) -> Linear:
    """Off-TPU fallback for stacked-layer Linears (the stacked kernels are
    TPU-only; see ops/quant_matmul.py)."""
    if "lidx" in lin.data:
        from mistralrs_tpu.quant.qlinear import unstack_layer

        return unstack_layer(lin)
    return lin


@register_kind("gguf_q4k")
def _q4k_forward(lin: Linear, x: jax.Array) -> jax.Array:
    if _pallas_available():
        from mistralrs_tpu.ops.quant_matmul import q4k_matmul

        return q4k_matmul(lin, x)
    return _ref_forward(_maybe_unstack(lin), x)


@register_kind("gguf_q2k")
def _q2k_forward(lin: Linear, x: jax.Array) -> jax.Array:
    if _pallas_available():
        from mistralrs_tpu.ops.quant_matmul import affine_qmatmul

        # block_o=256: r3 on-chip sweep winner at the 7B ffn GEMV
        # (0.671 ms vs 0.711 at the 512 default; scripts/kernel_sweep.py)
        y = affine_qmatmul(lin, x, bits=2, group=16, zs_key="minv",
                           block_o=256)
        if y is not None:
            return y
    return _ref_forward(lin, x)


@register_kind("gguf_q5k")
def _q5k_forward(lin: Linear, x: jax.Array) -> jax.Array:
    if _pallas_available():
        from mistralrs_tpu.ops.quant_matmul import q5k_matmul

        return q5k_matmul(lin, x)
    return _ref_forward(lin, x)


@register_kind("gguf_q6k")
def _q6k_forward(lin: Linear, x: jax.Array) -> jax.Array:
    if _pallas_available():
        from mistralrs_tpu.ops.quant_matmul import q6k_matmul

        return q6k_matmul(lin, x)
    return _ref_forward(_maybe_unstack(lin), x)


@register_kind("gguf_q8_0")
def _q8_0_forward(lin: Linear, x: jax.Array) -> jax.Array:
    if _pallas_available():
        from mistralrs_tpu.ops.quant_matmul import q8_0_matmul

        return q8_0_matmul(lin, x)
    return _ref_forward(_maybe_unstack(lin), x)
