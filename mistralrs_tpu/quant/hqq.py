"""HQQ — half-quadratic quantization (quantize-on-load, data-free).

Reference parity: mistralrs-quant/src/hqq/ — `HqqLayer::quantize`
(quantize.rs:9-131, proximal optimizer optimize.rs), dequant + forward
(mod.rs:202-531), bitpacking (hqq.cu / utils/ops.rs). Bits 8/4/3/2/1 over
`group_size` input dims; the affine params are optimized with the standard
HQQ half-quadratic solver: alternating lp-shrinkage on the weight residual
and a closed-form zero-point update.

Device layout matches the other quant kinds (K-major, premultiplied zs):
    kind "hqq_<bits>": q packed uint8 (8/4/2/1; 3-bit stays byte-per-value),
    scale [in/gs, out], zs = scale*zero [in/gs, out];
    dequant w[k,o] = q[k,o]*scale[g,o] - zs[g,o].
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mistralrs_tpu.quant.qlinear import Linear, register_kind


@dataclasses.dataclass(frozen=True)
class HqqType:
    """ISQ target marker (ref IsqType::HQQ4/HQQ8 lib.rs:77-95)."""

    bits: int
    group_size: int = 64

    def __post_init__(self):
        assert self.bits in (1, 2, 3, 4, 8)


def _shrink_lp(x: np.ndarray, beta: float, lp: float) -> np.ndarray:
    """lp<1 soft-shrinkage operator (HQQ paper eq. 8)."""
    ax = np.abs(x)
    return np.sign(x) * np.maximum(ax - (1.0 / beta) * np.power(ax + 1e-8, lp - 1.0), 0.0)


def quantize_hqq(
    w_out_in: np.ndarray,
    bits: int,
    group_size: int = 64,
    iters: int = 20,
    beta: float = 10.0,
    kappa: float = 1.01,
    lp: float = 0.7,
    dtype=jnp.bfloat16,
    bias: np.ndarray | None = None,
) -> Linear:
    """Quantize a torch-layout (out, in) weight (ref HqqLayer::quantize)."""
    out_f, in_f = w_out_in.shape
    assert in_f % group_size == 0, (in_f, group_size)
    maxq = (1 << bits) - 1
    w = w_out_in.T.astype(np.float32)  # [in, out]
    ng = in_f // group_size
    wg = w.reshape(ng, group_size, out_f)

    if bits == 1:
        # min/max init is terrible at 1 bit; start at mean +/- mean-abs-dev
        m = wg.mean(axis=1, keepdims=True)
        a = np.abs(wg - m).mean(axis=1, keepdims=True)
        scale = np.maximum(2.0 * a, 1e-8)
        zero = 0.5 - m / scale
    else:
        wmin = wg.min(axis=1, keepdims=True)
        wmax = wg.max(axis=1, keepdims=True)
        scale = np.maximum((wmax - wmin) / maxq, 1e-8)  # [ng, 1, out]
        zero = -wmin / scale

    # half-quadratic proximal iterations on the zero-point
    b = beta
    for _ in range(iters):
        q = np.clip(np.round(wg / scale + zero), 0, maxq)
        we = _shrink_lp(wg - (q - zero) * scale, b, lp)
        zero = np.mean(q - (wg - we) / scale, axis=1, keepdims=True)
        b *= kappa

    q = np.clip(np.round(wg / scale + zero), 0, maxq).astype(np.uint8)
    q = q.reshape(in_f, out_f)
    s2 = scale[:, 0]  # [ng, out]
    zs = (scale * zero)[:, 0]

    if bits == 4 and in_f % 512 == 0 and group_size % 32 == 0:
        # ride the fused Q4_K Pallas kernel (same w = q*scale - minv form)
        rep = group_size // 32
        q32s = np.repeat(s2, rep, axis=0).astype(np.float32)
        z32s = np.repeat(zs, rep, axis=0).astype(np.float32)
        half = in_f // 2
        qs_t = np.ascontiguousarray(q[:half] | (q[half:] << 4))
        data = {
            "qs": jnp.asarray(qs_t),
            "scale": jnp.asarray(q32s, dtype),
            "minv": jnp.asarray(z32s, dtype),
        }
        if bias is not None:
            data["b"] = jnp.asarray(bias, dtype)
        return Linear(kind="gguf_q4k", shape=(in_f, out_f), data=data)
    if bits in (8, 3):
        qdev = jnp.asarray(q)  # byte per value (3-bit: no sub-byte packing)
        kind = "hqq_8" if bits == 8 else "hqq_3"
    else:
        from mistralrs_tpu.quant.gptq import _pack_bytes_rows

        qdev = jnp.asarray(_pack_bytes_rows(q, bits))
        kind = f"hqq_{bits}"
    data = {
        "q": qdev,
        "scale": jnp.asarray(s2, dtype),
        "zs": jnp.asarray(zs, dtype),
    }
    if bias is not None:
        data["b"] = jnp.asarray(bias, dtype)
    return Linear(kind=kind, shape=(in_f, out_f), data=data)


def hqq_dequant_weights(lin: Linear, dtype, bits: int) -> jax.Array:
    """[in, out] dequantized."""
    q = lin.data["q"]
    in_f, out_f = lin.shape
    if bits in (8, 3):
        vals = q.astype(jnp.int32)
    else:
        per = 8 // bits
        mask = (1 << bits) - 1
        # plane-major pack (gptq._pack_bytes_rows): plane j = contiguous chunk
        parts = [((q >> (bits * j)) & mask) for j in range(per)]
        vals = jnp.concatenate(parts, axis=0).astype(jnp.int32)
    scale = lin.data["scale"].astype(dtype)
    zs = lin.data["zs"].astype(dtype)
    group = in_f // scale.shape[0]
    return vals.astype(dtype) * jnp.repeat(scale, group, axis=0) - jnp.repeat(zs, group, axis=0)


def _hqq_forward(bits: int):
    packed_bits = None if bits in (8, 3) else bits

    def fwd(lin: Linear, x: jax.Array) -> jax.Array:
        from mistralrs_tpu.quant.gguf_linear import _pallas_available

        if _pallas_available():
            from mistralrs_tpu.ops.quant_matmul import affine_qmatmul

            group = lin.shape[0] // lin.data["scale"].shape[0]
            yk = affine_qmatmul(lin, x, bits=packed_bits or 8, group=group)
            if yk is not None:
                return yk  # bias handled inside affine_qmatmul
        y = jnp.dot(x, hqq_dequant_weights(lin, x.dtype, bits))
        b = lin.data.get("b")
        if b is not None:
            y = y + b.astype(x.dtype)
        return y

    return fwd


for _bits in (1, 2, 3, 4, 8):
    register_kind(f"hqq_{_bits}")(_hqq_forward(_bits))
