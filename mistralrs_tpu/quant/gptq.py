"""GPTQ checkpoint loading + packed dequant-matmul formats.

Reference parity: mistralrs-quant/src/gptq/ — `GptqLayer` (gptq_linear
lib.rs:234-272) backed by q_gemm.cu (2/3/4/8-bit dequant GEMM, act-order
g_idx). The HF/AutoGPTQ on-disk format per linear:
    qweight int32 [in*bits/32, out]   (32/bits input dims packed per int32)
    qzeros  int32 [in/group, out*bits/32]
    scales  f16   [in/group, out]
    g_idx   int32 [in]                (group of each input dim; act-order)

TPU device layout mirrors the Q4_K design (K-major, scale/min precomputed):
    kind "gptq": q uint8 [ceil(in*bits/8) rows..., out] packed along `in`,
    scale [in/group, out], zs = scale*zero [in/group, out], plus an optional
    g_idx row-gather for desc_act checkpoints. Dequant is
    w[k, o] = q[k, o] * scale[g(k), o] - zs[g(k), o], fused into the matmul
    by XLA (Pallas kernel shares the Q4_K kernel's structure).

3-bit packing is irregular (32 values / 3 int32s); those unpack to one byte
per value at load (still 2x smaller than bf16 in HBM).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mistralrs_tpu.quant.qlinear import Linear, register_kind

def _unpack_int32_rows(packed: np.ndarray, bits: int, total: int) -> np.ndarray:
    """[n_packed, C] int32 -> [total, C] uint8, `32//bits` values per int32
    along axis 0 (AutoGPTQ row packing)."""
    per = 32 // bits
    mask = (1 << bits) - 1
    u = packed.astype(np.uint32)
    out = np.empty((packed.shape[0] * per, packed.shape[1]), np.uint8)
    for j in range(per):
        out[j::per] = ((u >> (bits * j)) & mask).astype(np.uint8)
    return out[:total]


def _unpack_int32_cols(packed: np.ndarray, bits: int, total: int) -> np.ndarray:
    """[R, n_packed] int32 -> [R, total] uint8 along axis 1."""
    per = 32 // bits
    mask = (1 << bits) - 1
    u = packed.astype(np.uint32)
    out = np.empty((packed.shape[0], packed.shape[1] * per), np.uint8)
    for j in range(per):
        out[:, j::per] = ((u >> (bits * j)) & mask).astype(np.uint8)
    return out[:, :total]


def _unpack_3bit_rows(packed: np.ndarray, total: int) -> np.ndarray:
    """AutoGPTQ 3-bit row packing: 32 values per 3 int32s (bit-contiguous)."""
    u = packed.astype(np.uint32)
    n_trip = packed.shape[0] // 3
    C = packed.shape[1]
    vals = np.empty((n_trip * 32, C), np.uint8)
    # 96 bits per 32-value triple; extract each 3-bit field straddling words
    w0, w1, w2 = u[0::3].astype(np.uint64), u[1::3].astype(np.uint64), u[2::3].astype(np.uint64)
    for j in range(32):
        lo_bit = 3 * j
        hi_bit = lo_bit + 3
        if hi_bit <= 32:
            v = (w0 >> lo_bit) & 0x7
        elif lo_bit < 32:
            take = 32 - lo_bit
            v = ((w0 >> lo_bit) | (w1 << take)) & 0x7
        elif hi_bit <= 64:
            v = (w1 >> (lo_bit - 32)) & 0x7
        elif lo_bit < 64:
            take = 64 - lo_bit
            v = ((w1 >> (lo_bit - 32)) | (w2 << take)) & 0x7
        else:
            v = (w2 >> (lo_bit - 64)) & 0x7
        vals[j::32] = v.astype(np.uint8)
    return vals[:total]


def _pack_3bit_rows(vals: np.ndarray) -> np.ndarray:
    """Inverse of _unpack_3bit_rows: [R, C] uint8 (values < 8, R % 32 == 0)
    -> [R*3/32, C] int32, 32 values bit-contiguous per 3 uint32 words."""
    R, C = vals.shape
    assert R % 32 == 0, R
    n_trip = R // 32
    w = np.zeros((n_trip, 3, C), np.uint64)
    v = vals.reshape(n_trip, 32, C).astype(np.uint64)
    for j in range(32):
        lo_bit = 3 * j
        word, off = divmod(lo_bit, 32)
        w[:, word] |= v[:, j] << off
        if off > 29:  # field straddles into the next word
            w[:, word + 1] |= v[:, j] >> (32 - off)
    return (w & 0xFFFFFFFF).astype(np.uint32).reshape(n_trip * 3, C).astype(np.int32)


def _pack_bytes_rows(vals: np.ndarray, bits: int) -> np.ndarray:
    """[in, out] uint8 (values < 2^bits) -> packed uint8 [in*bits/8, out],
    PLANE-MAJOR: byte row r bit-slot j holds element j*(in*bits/8) + r, so
    each unpacked plane is a contiguous element chunk — the fused affine
    kernel (ops/quant_matmul.affine_qmatmul) contracts plane j against a
    contiguous x/scale slice at a static offset, no sublane interleave."""
    per = 8 // bits
    K, O = vals.shape
    assert K % per == 0
    planes = vals.reshape(per, K // per, O).astype(np.uint16)
    out = np.zeros((K // per, O), np.uint16)
    for j in range(per):
        out |= planes[j] << (bits * j)
    return out.astype(np.uint8)


def gptq_linear_from_tensors(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: np.ndarray | None,
    bits: int,
    in_features: int,
    out_features: int,
    dtype=jnp.bfloat16,
    zero_plus_one: bool = True,
    bias: np.ndarray | None = None,
) -> Linear:
    """Build the device Linear from AutoGPTQ tensors.

    zero_plus_one: v1 checkpoints store zero-1 (kernels add 1 back);
    gptq_v2 stores the true zero (ref q_gemm.cu zero handling)."""
    assert bits in (2, 3, 4, 8), bits
    if bits == 3:
        q = _unpack_3bit_rows(qweight, in_features)  # [in, out] uint8
        zeros = _unpack_3bit_cols(qzeros, out_features)
    else:
        q = _unpack_int32_rows(qweight, bits, in_features)  # [in, out] uint8
        zeros = _unpack_int32_cols(qzeros, bits, out_features)  # [ng, out]
    if zero_plus_one:
        zeros = zeros.astype(np.int32) + 1
    s = scales.astype(np.float32)  # [ng, out]
    zs = s * zeros.astype(np.float32)
    n_groups = s.shape[0]
    group_size = in_features // n_groups
    gi = None
    in_perm = None
    if g_idx is not None:
        want = np.arange(in_features) // group_size
        if not np.array_equal(g_idx, want):
            counts = np.bincount(g_idx, minlength=n_groups)
            if np.all(counts == group_size):
                # act-order (desc_act): hoist the gather to load time by
                # sorting weight rows into contiguous groups (exllama-style
                # reorder, ref q_gemm.cu shuffle); forward gathers only the
                # [in]-sized activation permutation instead of an
                # [in,out]-sized scale/zero gather per step.
                perm = np.argsort(g_idx, kind="stable")
                q = np.ascontiguousarray(q[perm])
                in_perm = jnp.asarray(perm.astype(np.int32))
            else:
                # ragged groups: keep the runtime gather fallback
                gi = jnp.asarray(g_idx.astype(np.int32))
    if (
        bits == 4
        and gi is None
        and in_features % 512 == 0
        and group_size % 32 == 0
    ):
        # 4-bit contiguous-group GPTQ maps exactly onto the Q4_K device
        # format (w = q*scale - minv): expand scales to 32-granularity,
        # pair nibbles globally, and ride the fused Pallas kernel.
        rep = group_size // 32
        q32s = np.repeat(s, rep, axis=0).astype(np.float32)  # [in/32, out]
        z32s = np.repeat(zs, rep, axis=0).astype(np.float32)
        half = in_features // 2
        qs_t = np.ascontiguousarray(q[:half] | (q[half:] << 4))
        data = {
            "qs": jnp.asarray(qs_t),
            "scale": jnp.asarray(q32s, dtype),
            "minv": jnp.asarray(z32s, dtype),
        }
        if in_perm is not None:
            data["in_perm"] = in_perm
        if bias is not None:
            data["b"] = jnp.asarray(bias, dtype)
        return Linear(kind="gguf_q4k", shape=(in_features, out_features), data=data)
    if bits == 3:
        qdev = jnp.asarray(q)  # byte per value
        kind = "gptq_b8"  # stored unpacked bytes
    else:
        qdev = jnp.asarray(_pack_bytes_rows(q, bits))
        kind = f"gptq_{bits}"
    data = {
        "q": qdev,
        "scale": jnp.asarray(s, dtype),
        "zs": jnp.asarray(zs, dtype),
    }
    if gi is not None:
        data["g_idx"] = gi
    if in_perm is not None:
        data["in_perm"] = in_perm
    if bias is not None:
        data["b"] = jnp.asarray(bias, dtype)
    return Linear(kind=kind, shape=(in_features, out_features), data=data)


def _unpack_3bit_cols(packed: np.ndarray, total: int) -> np.ndarray:
    """Column-direction 3-bit unpack: [R, n*3] int32 -> [R, total] uint8."""
    return _unpack_3bit_rows(packed.T, total).T


# ------------------------------------------------------------------ forward
def _gptq_weights(lin: Linear, dtype, bits: int) -> jax.Array:
    """Dequantize to w_t [in, out] on device."""
    q = lin.data["q"]
    in_f, out_f = lin.shape
    if bits == 8:
        vals = q.astype(jnp.int32)  # [in, out] bytes
    else:
        per = 8 // bits
        mask = (1 << bits) - 1
        # plane-major pack: plane j = contiguous elements [j*in/per, ...)
        parts = [((q >> (bits * j)) & mask) for j in range(per)]
        vals = jnp.concatenate(parts, axis=0).astype(jnp.int32)
    scale = lin.data["scale"].astype(dtype)  # [ng, out]
    zs = lin.data["zs"].astype(dtype)
    gi = lin.data.get("g_idx")
    if gi is not None:
        srow = scale[gi]  # [in, out] gather (act-order)
        zrow = zs[gi]
    else:
        group = in_f // scale.shape[0]
        srow = jnp.repeat(scale, group, axis=0)
        zrow = jnp.repeat(zs, group, axis=0)
    return vals.astype(dtype) * srow - zrow  # [in, out]


def _gptq_forward(bits: int, packed_bits: int | None = None):
    """packed_bits: sub-byte plane-major pack width (None = byte-per-value
    storage, e.g. 3-bit); drives the fused affine kernel's unpack."""

    def fwd(lin: Linear, x: jax.Array) -> jax.Array:
        if "g_idx" not in lin.data:
            from mistralrs_tpu.quant.gguf_linear import _pallas_available

            if _pallas_available():
                from mistralrs_tpu.ops.quant_matmul import affine_qmatmul

                group = lin.shape[0] // lin.data["scale"].shape[0]
                y = affine_qmatmul(lin, x, bits=packed_bits or 8, group=group)
                if y is not None:
                    return y
        w_t = _gptq_weights(lin, x.dtype, bits)
        y = jnp.dot(x, w_t)
        b = lin.data.get("b")
        if b is not None:
            y = y + b.astype(x.dtype)
        return y

    return fwd


register_kind("gptq_2")(_gptq_forward(2, packed_bits=2))
register_kind("gptq_4")(_gptq_forward(4, packed_bits=4))
register_kind("gptq_8")(_gptq_forward(8))
register_kind("gptq_b8")(_gptq_forward(8))


# ------------------------------------------------- reference-style quantizer
def quantize_gptq_rtn(
    w_out_in: np.ndarray, bits: int, group_size: int = 128, sym: bool = False
) -> dict[str, np.ndarray]:
    """Round-to-nearest GPTQ-format quantizer (no Hessian pass) — produces
    AutoGPTQ-layout tensors for tests and ISQ-to-GPTQ."""
    out_f, in_f = w_out_in.shape
    assert in_f % group_size == 0
    w = w_out_in.T.astype(np.float32)  # [in, out]
    ng = in_f // group_size
    wg = w.reshape(ng, group_size, out_f)
    maxq = (1 << bits) - 1
    if sym:
        amax = np.abs(wg).max(axis=1, keepdims=True)
        scale = np.maximum(amax / ((maxq + 1) / 2 - 0.5), 1e-9)
        zero = np.full_like(scale, (maxq + 1) // 2)
    else:
        wmin = np.minimum(wg.min(axis=1, keepdims=True), 0)
        wmax = np.maximum(wg.max(axis=1, keepdims=True), 0)
        scale = np.maximum((wmax - wmin) / maxq, 1e-9)
        zero = np.clip(np.round(-wmin / scale), 0, maxq)
    q = np.clip(np.round(wg / scale) + zero, 0, maxq).astype(np.uint8)
    q = q.reshape(in_f, out_f)
    zcols = np.clip(zero[:, 0].astype(np.int32) - 1, 0, maxq).astype(np.uint32)  # v1 -1
    if bits == 3:
        # AutoGPTQ 3-bit: 32 values bit-contiguously span 3 uint32 words
        # (the inverse of _unpack_3bit_rows)
        qweight = _pack_3bit_rows(q)
        qzeros = _pack_3bit_rows(zcols.T).T
    else:
        per = 32 // bits
        qweight = np.zeros((in_f // per, out_f), np.uint32)
        for j in range(per):
            qweight |= q[j::per].astype(np.uint32) << (bits * j)
        qzeros = np.zeros((ng, out_f // per), np.uint32)
        for j in range(per):
            qzeros |= zcols[:, j::per] << (bits * j)
    return {
        "qweight": np.ascontiguousarray(qweight.astype(np.int32)),
        "qzeros": np.ascontiguousarray(qzeros.astype(np.int32)),
        # ascontiguousarray: w.T keeps F-order through the group reductions,
        # and safetensors' numpy writer serializes raw bytes without
        # normalizing order — an F-ordered scales array would round-trip
        # corrupted through save_file.
        "scales": np.ascontiguousarray(scale[:, 0].astype(np.float16)),  # [ng, out]
        "g_idx": (np.arange(in_f) // group_size).astype(np.int32),
    }
