"""Fused dequant-GEMM Pallas kernels for packed GGUF weights.

Reference parity: the CUDA dequant matmuls behind mistralrs-quant
(`GgufMatMul` via candle k-quant kernels; GPTQ q_gemm.cu) — SURVEY.md §7
hard part 2: weights stream from HBM *packed* (4.5 bit/weight for Q4_K) and
are expanded to bf16 only in VMEM, feeding the MXU. Decode is HBM-bound, so
packed streaming is the entire speedup over a bf16 model.

Layouts are K-major (quant/gguf_linear.py): the contraction axis lives on
sublanes, `out` on lanes, so every tile obeys the (8,128) constraints and
the dequantized tile multiplies as x[B,Kt] @ w[Kt,To] with zero shuffles.

Q4_K math per 256-element super-block (8 sub-blocks of 32):
    w[i] = scale[sub(i)] * q[i] - minv[sub(i)],  q in [0,15]
    y[b,o] = sum_i x[b,i] w[i,o]
           = sum_i x[b,i] scale*q  -  sum_sub xsum[b,sub] * minv[sub,o]
The min-term is computed *outside* the kernel as a standard XLA matmul
(xsum [B,K/32] @ minv [K/32,O] — 1/32 of the main GEMM's FLOPs), so the
kernel only streams qs+scale and never materializes (scale*q - minv).

Grid: (O/To, K/Kt) with K innermost ("arbitrary") accumulating into a VMEM
f32 scratch. x stays resident [B, Kt] per step; B padded to 8 by the caller.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mistralrs_tpu.quant.qlinear import STACKED_OK, Linear

# these kinds' dispatchers below consume stacked-layer Linears directly
# (scalar-prefetch kernels); every other kind unstacks in qlinear.linear()
STACKED_OK.update({"gguf_q4k", "gguf_q6k", "gguf_q8_0"})

logger = logging.getLogger(__name__)
_logged_fallbacks: set[tuple] = set()


def _log_fallback(kind: str, shape: tuple, reason: str) -> None:
    """One log line per (kernel, shape, reason): silent fused->dense
    fallbacks hide 5-10x decode regressions (VERDICT r2 #5), but prefill
    fallbacks are by-design and would spam at INFO."""
    key = (kind, shape, reason)
    if key in _logged_fallbacks:
        return
    _logged_fallbacks.add(key)
    level = logging.DEBUG if reason == "prefill" else logging.INFO
    logger.log(level, "%s kernel fallback to XLA dequant at shape %s (%s)",
               kind, shape, reason)


def _colsum_dot(xsum_t: jax.Array, m: jax.Array) -> jax.Array:
    """[nsub, B] x [nsub, To] -> [B, To] f32 (contraction on sublanes of
    both operands — one tiny MXU dot per tile for the fused min/offset
    epilogues; r4 kernel-to-engine closure, VERDICT r3 next-step 1b)."""
    return jax.lax.dot_general(
        xsum_t, m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _q4k_kernel(x_ref, qs_ref, scale_ref, minv_ref, xsum_ref, o_ref, acc_ref,
                *, block_k: int):
    """Paired-nibble tile: byte row r of the k-th qs tile holds elements
    (K_off + r) and (K/2 + K_off + r); both halves unpack with one mask /
    one shift (no sublane interleave) and contract against contiguous x and
    scale slices.

    The min-term (y -= sum_sub xsum[b,sub] * minv[sub,o]) is FUSED as two
    tiny per-k-step dots on the accumulator (r4): minv streams once inside
    the kernel instead of a second pass through an external XLA matmul, and
    the per-projection dispatch disappears. xsum [K/32, B] = per-32-block
    sums of the ORIGINAL activations, computed outside (CSEs across the
    projections sharing an activation)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = pl.program_id(1)
    bkh = block_k // 2
    Khalf = x_ref.shape[1] // 2
    nsub = bkh // 32
    dt = x_ref.dtype
    q32 = qs_ref[...].astype(jnp.int32)  # Mosaic: no direct uint8->bf16 cast
    lo = (q32 & 0xF).astype(dt)  # [bkh, To] elements [k*bkh, (k+1)*bkh)
    hi = (q32 >> 4).astype(dt)  # elements [Khalf + k*bkh, ...)
    x1 = x_ref[:, pl.dslice(pl.multiple_of(k * bkh, 128), bkh)]
    x2 = x_ref[:, pl.dslice(pl.multiple_of(Khalf + k * bkh, 128), bkh)]
    s1 = scale_ref[pl.dslice(pl.multiple_of(k * nsub, 8), nsub), :].astype(jnp.float32)
    s2 = scale_ref[
        pl.dslice(pl.multiple_of((Khalf + k * bkh) // 32, 8), nsub), :
    ].astype(jnp.float32)
    m1 = minv_ref[pl.dslice(pl.multiple_of(k * nsub, 8), nsub), :].astype(jnp.float32)
    m2 = minv_ref[
        pl.dslice(pl.multiple_of((Khalf + k * bkh) // 32, 8), nsub), :
    ].astype(jnp.float32)
    xs1 = xsum_ref[pl.dslice(pl.multiple_of(k * nsub, 8), nsub), :]
    xs2 = xsum_ref[
        pl.dslice(pl.multiple_of((Khalf + k * bkh) // 32, 8), nsub), :
    ]
    # scale applied on the [B, To] accumulator per 32-element sub-block
    # (VPU cost ~B*To per sub-block instead of 32*To weight-side muls —
    # decode is VPU-dequant-bound, so fewer elementwise ops win)
    acc = acc_ref[...] - _colsum_dot(xs1, m1) - _colsum_dot(xs2, m2)
    for i in range(nsub):
        p1 = jnp.dot(x1[:, 32 * i : 32 * i + 32], lo[32 * i : 32 * i + 32],
                     preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        p2 = jnp.dot(x2[:, 32 * i : 32 * i + 32], hi[32 * i : 32 * i + 32],
                     preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        acc = acc + p1 * s1[i][None, :] + p2 * s2[i][None, :]
    acc_ref[...] = acc

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _xsum32_t(x: jax.Array) -> jax.Array:
    """Per-32-block sums of x [B, K] -> [K/32, B] f32 (transposed so kernel
    sublane slices stay 8-aligned, like _quantize_acts_q8's scales)."""
    B, K = x.shape
    return jnp.sum(x.astype(jnp.float32).reshape(B, K // 32, 32), axis=2).T


@functools.partial(jax.jit, static_argnames=("block_o", "block_k"))
def _q4k_matmul_padded(x, qs, scale, minv, *, block_o: int, block_k: int):
    """x [B, K]; qs [K/2, O] paired layout; scale/minv [K/32, O].
    Min-term fused in-kernel (see _q4k_kernel)."""
    B, K = x.shape
    O = qs.shape[1]
    grid = (O // block_o, K // block_k)
    return pl.pallas_call(
        functools.partial(_q4k_kernel, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((B, O), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((B, K), lambda o, k: (0, 0)),
                pl.BlockSpec((block_k // 2, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((K // 32, block_o), lambda o, k: (0, o)),
                pl.BlockSpec((K // 32, block_o), lambda o, k: (0, o)),
                pl.BlockSpec((K // 32, B), lambda o, k: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K // 2 + O * K // 32 * 4 + B * K * 2 + B * O * 2,
            transcendentals=0,
        ),
    )(x, qs, scale, minv, _xsum32_t(x))


# ---------------------------------------------------- stacked-layer kernels
#
# r4 profiler finding (scripts/profile_step.py, 15:00 UTC): feeding the
# Pallas kernels from lax.scan xs slices materializes EVERY layer's packed
# weights as an async HBM->HBM copy per step (dynamic-slice fusions /
# slice-starts in the trace) — custom-calls can't consume a view, so the
# weight bytes move twice (~122 MB/layer/step of extra traffic = the
# 0.504-vs-0.33 ms/layer kernel-to-engine gap). These variants instead
# take the FULL stacked [L, ...] arrays plus a scalar-prefetch layer index
# and tile DIRECTLY from the stacked array (BlockSpec leading dim None,
# index_map (s[0], k, o)) — zero copies. Gated: MISTRALRS_STACKED_KERNELS.


def _use_stacked_kernels() -> bool:
    """Default ON since the 15:29 UTC on-chip A/B (see decoder
    _stacked_kernels); MISTRALRS_STACKED_KERNELS=0 reverts."""
    import os

    if os.environ.get("MISTRALRS_STACKED_KERNELS", "1") != "1":
        return False
    return True


@functools.partial(jax.jit, static_argnames=("block_o", "block_k", "out_dtype"))
def _q4k_q8_matmul_stacked(lidx, x, qs, scale, minv, *, block_o: int,
                           block_k: int, out_dtype=jnp.bfloat16):
    """Stacked-layer Q4_K int8 forward: qs [L, K/2, O], scale/minv
    [L, K/32, O]; lidx int32 [1] selects the layer inside the kernel's
    index maps (scalar prefetch) — weights stream straight from the
    stacked array."""
    B, K = x.shape
    O = qs.shape[2]
    xq, xs_t = _quantize_acts_q8(x)

    def kern(s_ref, *refs):
        return _q4k_q8_kernel(*refs, block_k=block_k)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, O), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(O // block_o, K // block_k),
            in_specs=[
                pl.BlockSpec((B, K), lambda o, k, s: (0, 0)),
                pl.BlockSpec((None, block_k // 2, block_o),
                             lambda o, k, s: (s[0], k, o)),
                pl.BlockSpec((None, K // 32, block_o),
                             lambda o, k, s: (s[0], 0, o)),
                pl.BlockSpec((None, K // 32, block_o),
                             lambda o, k, s: (s[0], 0, o)),
                pl.BlockSpec((K // 32, B), lambda o, k, s: (0, 0)),
                pl.BlockSpec((K // 32, B), lambda o, k, s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k, s: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K // 2 + O * K // 32 * 4 + B * K + B * O * 2,
            transcendentals=0,
        ),
    )(lidx, xq, qs, scale, minv, xs_t, _xsum32_t(x))


@functools.partial(jax.jit, static_argnames=("block_o", "G", "out_dtype"))
def _q6k_q8_matmul_stacked(lidx, x, ql, qh, scale, *, block_o: int, G: int,
                           out_dtype=jnp.bfloat16):
    """Stacked-layer natural-order Q6_K int8 forward: ql [L, K/2, O],
    qh [L, K/4, O], scale [L, K/16, O]."""
    B, K = x.shape
    O = ql.shape[2]
    C = K // (4 * G)
    xq, xs_t = _quantize_acts_q8(x)
    xs_p = _perm16_t(xs_t.T, C, G, 32)
    xsum16 = jnp.sum(x.astype(jnp.float32).reshape(B, K // 16, 16), axis=2)
    xsum16_p = _perm16_t(xsum16, C, G, 16)

    def kern(s_ref, *refs):
        return _q6k_q8_kernel(*refs, G=G)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, O), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(O // block_o, C),
            in_specs=[
                pl.BlockSpec((B, K), lambda o, k, s: (0, 0)),
                pl.BlockSpec((None, 2 * G, block_o),
                             lambda o, k, s: (s[0], k, o)),
                pl.BlockSpec((None, G, block_o),
                             lambda o, k, s: (s[0], k, o)),
                pl.BlockSpec((None, G // 4, block_o),
                             lambda o, k, s: (s[0], k, o)),
                pl.BlockSpec((G // 8, B), lambda o, k, s: (k, 0)),
                pl.BlockSpec((G // 4, B), lambda o, k, s: (k, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k, s: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K // 2 + O * K // 4 + O * K // 16 * 2 + B * K,
            transcendentals=0,
        ),
    )(lidx, xq, ql, qh, scale, xs_p, xsum16_p)


@functools.partial(jax.jit, static_argnames=("block_o", "G"))
def _q6k_matmul_stacked(lidx, x, ql, qh, scale, *, block_o: int, G: int):
    """Stacked-layer natural-order Q6_K bf16 forward (the B > 16 route)."""
    B, K = x.shape
    O = ql.shape[2]
    C = K // (4 * G)
    xsum16 = jnp.sum(x.astype(jnp.float32).reshape(B, K // 16, 16), axis=2)
    xsum16_p = _perm16_t(xsum16, C, G, 16)

    def kern(s_ref, *refs):
        return _q6k_kernel(*refs, G=G, natural=True)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, O), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(O // block_o, C),
            in_specs=[
                pl.BlockSpec((B, K), lambda o, k, s: (0, 0)),
                pl.BlockSpec((None, 2 * G, block_o),
                             lambda o, k, s: (s[0], k, o)),
                pl.BlockSpec((None, G, block_o),
                             lambda o, k, s: (s[0], k, o)),
                pl.BlockSpec((None, G // 4, block_o),
                             lambda o, k, s: (s[0], k, o)),
                pl.BlockSpec((G // 4, B), lambda o, k, s: (k, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k, s: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K // 2 + O * K // 4 + O * K // 16 * 2 + B * K * 2 + B * O * 2,
            transcendentals=0,
        ),
    )(lidx, x, ql, qh, scale, xsum16_p)


# ------------------------------------------------ Q4_K int8-MXU decode path
#
# ggml-style Q8 activation quantization + integer MXU dots: the r3
# high-ITERS A/B (scripts/dequant_ab3.py, real chip) measured the exact
# per-sub-block int8 structure at 0.064-0.066 ms for the 7B ffn GEMV vs
# 0.151 for the bf16-unpack kernel — 2.3x. The VPU unpack chain shrinks to
# uint8->int32->mask/shift->int8 and the dots run on the int8 MXU (2x rate,
# and the pipeline sustains ~460 GB/s of packed bytes vs ~200 for the bf16
# variant). The reference's own CUDA path quantizes activations the same
# way (candle k-quant vec_dot with Q8_1 activations + dp4a), so serving
# numerics match the reference's accepted approach. Activations quantize
# per (row, 32-block) to int8 with an f32 scale: |err| <= max|x_block|/254.


def _quantize_acts_q8(x2d: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x [B, K] -> (xq int8 [B, K], xs_t f32 [K/32, B]) per-32-block scales
    (transposed so the kernel's sublane slices stay 8-aligned)."""
    B, K = x2d.shape
    xf = x2d.astype(jnp.float32).reshape(B, K // 32, 32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=2), 1e-10) / 127.0  # [B, K/32]
    xq = jnp.clip(jnp.round(xf / xs[..., None]), -127, 127)
    return xq.astype(jnp.int8).reshape(B, K), xs.T


def _q4k_q8_kernel(xq_ref, qs_ref, scale_ref, minv_ref, xs_ref, xsum_ref,
                   o_ref, acc_ref, *, block_k: int):
    """Per-32-sub-block int8 MXU dots; combined (weight x activation) scale
    applied on the [B, To] int32 accumulator. Same paired-nibble layout and
    alignment contract as _q4k_kernel. Min-term fused in-kernel (r4) as two
    tiny dots per k-step on xsum = per-32 sums of the ORIGINAL activations
    (more accurate than ggml's Q8 block-sums and one fewer external matmul
    per projection)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = pl.program_id(1)
    bkh = block_k // 2
    Khalf = xq_ref.shape[1] // 2
    nsub = bkh // 32
    q32 = qs_ref[...].astype(jnp.int32)
    lo = (q32 & 0xF).astype(jnp.int8)  # q in [0,15] fits int8 directly
    hi = (q32 >> 4).astype(jnp.int8)
    x1 = xq_ref[:, pl.dslice(pl.multiple_of(k * bkh, 128), bkh)]
    x2 = xq_ref[:, pl.dslice(pl.multiple_of(Khalf + k * bkh, 128), bkh)]
    s1 = scale_ref[pl.dslice(pl.multiple_of(k * nsub, 8), nsub), :].astype(jnp.float32)
    s2 = scale_ref[
        pl.dslice(pl.multiple_of((Khalf + k * bkh) // 32, 8), nsub), :
    ].astype(jnp.float32)
    m1 = minv_ref[pl.dslice(pl.multiple_of(k * nsub, 8), nsub), :].astype(jnp.float32)
    m2 = minv_ref[
        pl.dslice(pl.multiple_of((Khalf + k * bkh) // 32, 8), nsub), :
    ].astype(jnp.float32)
    xm1 = xsum_ref[pl.dslice(pl.multiple_of(k * nsub, 8), nsub), :]
    xm2 = xsum_ref[pl.dslice(pl.multiple_of((Khalf + k * bkh) // 32, 8), nsub), :]
    xs1 = xs_ref[pl.dslice(pl.multiple_of(k * nsub, 8), nsub), :]  # [nsub, B]
    xs2 = xs_ref[pl.dslice(pl.multiple_of((Khalf + k * bkh) // 32, 8), nsub), :]
    acc = acc_ref[...] - _colsum_dot(xm1, m1) - _colsum_dot(xm2, m2)
    for i in range(nsub):
        p1 = jax.lax.dot_general(
            x1[:, 32 * i : 32 * i + 32], lo[32 * i : 32 * i + 32],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        p2 = jax.lax.dot_general(
            x2[:, 32 * i : 32 * i + 32], hi[32 * i : 32 * i + 32],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = acc + (p1.astype(jnp.float32) * xs1[i][:, None] * s1[i][None, :]
                     + p2.astype(jnp.float32) * xs2[i][:, None] * s2[i][None, :])
    acc_ref[...] = acc

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_o", "block_k", "out_dtype"))
def _q4k_q8_matmul_padded(x, qs, scale, minv, *, block_o: int, block_k: int,
                          out_dtype=jnp.bfloat16):
    """Q8-activation int8-MXU forward: x [B, K] (any float dtype); returns
    [B, O] in out_dtype. Min-term uses the ORIGINAL activations (more
    accurate than ggml's Q8 block-sums) and is fused in-kernel (r4)."""
    B, K = x.shape
    O = qs.shape[1]
    xq, xs_t = _quantize_acts_q8(x)
    return pl.pallas_call(
        functools.partial(_q4k_q8_kernel, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((B, O), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(O // block_o, K // block_k),
            in_specs=[
                pl.BlockSpec((B, K), lambda o, k: (0, 0)),
                pl.BlockSpec((block_k // 2, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((K // 32, block_o), lambda o, k: (0, o)),
                pl.BlockSpec((K // 32, block_o), lambda o, k: (0, o)),
                pl.BlockSpec((K // 32, B), lambda o, k: (0, 0)),
                pl.BlockSpec((K // 32, B), lambda o, k: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K // 2 + O * K // 32 * 4 + B * K + B * O * 2,
            transcendentals=0,
        ),
    )(xq, qs, scale, minv, xs_t, _xsum32_t(x))


def _use_q4k_int8() -> bool:
    """int8-MXU decode path gate: TPU only (the interpret tests force the
    bf16 kernel explicitly), MISTRALRS_Q4K_INT8=0 reverts."""
    import os

    if os.environ.get("MISTRALRS_Q4K_INT8") == "0":
        return False
    return jax.default_backend() == "tpu"


def _pad_rows(x2d: jax.Array, mult: int) -> jax.Array:
    B = x2d.shape[0]
    pad = (-B) % mult
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    return x2d


def _pick_blocks(out_f: int, in_f: int, block_o: int, block_k: int) -> tuple[int, int]:
    bo = min(block_o, out_f)
    bk = min(block_k, in_f)
    while out_f % bo:
        bo //= 2
    while in_f % bk:
        bk //= 2
    return bo, bk


def q4k_matmul(lin: Linear, x: jax.Array, *, block_o: int = 1024, block_k: int = 1024) -> jax.Array:
    """Forward for kind 'gguf_q4k'. x [..., K] -> [..., O]. Accepts a
    stacked-layer Linear (data [L, ...] + "lidx", see the stacked-layer
    section): the int8 decode path streams straight from the stacked
    array; every other route unstacks first."""
    from mistralrs_tpu.quant.qlinear import unstack_layer

    in_f, out_f = lin.shape
    lidx = lin.data.get("lidx")
    lead = x.shape[:-1]
    bo, bk = _pick_blocks(out_f, in_f, block_o, block_k)
    n_rows = 1
    for d in lead:
        n_rows *= d
    if bk < 512 or in_f % 512 or n_rows > 256:
        # the kernel's alignment hints (Khalf + k*bkh multiple of 128, scale
        # row (Khalf + k*bkh)//32 multiple of 8) are only TRUE when
        # in % 512 == 0 — e.g. in=576 picks bk=576 with Khalf=288 and Mosaic
        # would mis-lower the dynamic slices silently; such shapes (and tiny
        # matrices) fall back to the fused XLA reference.
        # n_rows > 256 = prefill-sized calls: compute-bound, so dequant-
        # then-XLA-dot is right, and the kernel's resident [B, K] x tile
        # would blow the 16 MiB scoped-VMEM stack (seen on-chip at B=2048:
        # bf16[2048,4096] = 16 MiB + temporaries).
        from mistralrs_tpu.quant.gguf_linear import _ref_forward

        _log_fallback("q4k", lin.shape,
                      "prefill" if n_rows > 256 else "alignment")
        return _ref_forward(unstack_layer(lin) if lidx is not None else lin, x)
    x2 = _pad_rows(x.reshape(-1, in_f), 8)
    if _use_q4k_int8():
        if lidx is not None:
            y = _q4k_q8_matmul_stacked(
                jnp.reshape(lidx, (1,)).astype(jnp.int32), x2,
                lin.data["qs"], lin.data["scale"], lin.data["minv"],
                block_o=bo, block_k=bk, out_dtype=x.dtype,
            )
        else:
            y = _q4k_q8_matmul_padded(
                x2, lin.data["qs"], lin.data["scale"], lin.data["minv"],
                block_o=bo, block_k=bk, out_dtype=x.dtype,
            )
    else:
        if lidx is not None:
            lin = unstack_layer(lin)
        y = _q4k_matmul_padded(
            x2, lin.data["qs"], lin.data["scale"], lin.data["minv"],
            block_o=bo, block_k=bk,
        )
    n = 1
    for d in lead:
        n *= d
    y = y[:n].reshape(*lead, out_f)
    b = lin.data.get("b")
    if b is not None:
        if lidx is not None and b.ndim > 1:
            b = jnp.take(b, lidx, axis=0)
        y = y + b.astype(y.dtype)
    return y


# ---------------------------------------------------- generic plane affine
# One kernel family serves every "w = q*scale[g] - zs[g]" format whose
# sub-byte values are PLANE-MAJOR packed (plane j = contiguous element chunk
# [j*K/per, (j+1)*K/per)): GGUF Q2_K (group 16), GPTQ 2/8-bit + 3-bit bytes,
# HQQ 1/2/3/8 (group = quant group_size). Ref: q_gemm.cu / hqq.cu one-CUDA-
# kernel-per-format — here one parametrized Mosaic kernel.


def _affine_kernel(x_ref, q_ref, scale_ref, zs_ref, xsumg_ref, o_ref, acc_ref,
                   *, bits: int, group: int, block_k: int):
    """The zs term (y -= xsum_g @ zs) is fused in-kernel per plane (r4):
    one tiny dot on the accumulator instead of a second external XLA matmul
    re-streaming zs."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = pl.program_id(1)
    dt = x_ref.dtype
    per = 8 // bits
    mask = (1 << bits) - 1
    K_per = x_ref.shape[1] // per
    To = o_ref.shape[1]
    nsub = block_k // group
    q = q_ref[...].astype(jnp.int32)  # [block_k, To]
    acc = acc_ref[...]
    for j in range(per):
        off = j * K_per + k * block_k
        vals = ((q >> (bits * j)) & mask).astype(dt) if per > 1 else q.astype(dt)
        # scale rows slice at off//group: the caller guarantees
        # K_per % (8*group) == 0 and block_k % (8*group) == 0, so
        # off//group is a static multiple of 8 — Mosaic requires the proof
        # (on-chip it refuses unaligned sublane slice offsets; seen in the
        # r3 kernel_sweep q2k failures)
        sj = scale_ref[pl.dslice(pl.multiple_of(off // group, 8), nsub), :].astype(dt)
        zj = zs_ref[pl.dslice(pl.multiple_of(off // group, 8), nsub), :].astype(jnp.float32)
        xgj = xsumg_ref[pl.dslice(pl.multiple_of(off // group, 8), nsub), :]
        srep = jnp.broadcast_to(sj[:, None, :], (nsub, group, To)).reshape(block_k, To)
        xj = x_ref[:, pl.dslice(pl.multiple_of(off, 128), block_k)]
        acc = acc + jnp.dot(xj, vals * srep, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        acc = acc - _colsum_dot(xgj, zj)
    acc_ref[...] = acc

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group", "block_o", "block_k"))
def _affine_matmul_padded(x, q, scale, zs, *, bits: int, group: int,
                          block_o: int, block_k: int):
    """x [B, K]; q plane-major packed [K*bits/8, O] (bytes when bits==8);
    scale/zs [K/group, O]. y = sum x*q*scale - xsum_g @ zs (zs term fused
    in-kernel, r4)."""
    B, K = x.shape
    O = q.shape[1]
    per = 8 // bits
    xsum_g = jnp.sum(
        x.astype(jnp.float32).reshape(B, K // group, group), axis=2).T
    return pl.pallas_call(
        functools.partial(_affine_kernel, bits=bits, group=group, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((B, O), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(O // block_o, (K // per) // block_k),
            in_specs=[
                pl.BlockSpec((B, K), lambda o, k: (0, 0)),
                pl.BlockSpec((block_k, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((K // group, block_o), lambda o, k: (0, o)),
                pl.BlockSpec((K // group, block_o), lambda o, k: (0, o)),
                pl.BlockSpec((K // group, B), lambda o, k: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K // per + O * K // group * 4 + B * K * 2 + B * O * 2,
            transcendentals=0,
        ),
    )(x, q, scale, zs, xsum_g)


def affine_qmatmul(lin: Linear, x: jax.Array, *, bits: int, group: int,
                   q_key: str = "q", zs_key: str = "zs",
                   block_o: int = 512, block_k: int = 512) -> jax.Array:
    """Fused forward for plane-major affine formats. Returns None when the
    shape/layout constraints don't hold (caller falls back to XLA dequant)."""
    in_f, out_f = lin.shape
    per = 8 // bits
    K_per = in_f // per
    bo = min(block_o, out_f)
    while out_f % bo:
        bo //= 2
    # k-step must cover whole multiples of 8 scale groups so the in-kernel
    # scale row slices stay sublane-aligned (Mosaic multiple-of-8 proof)
    bk = min(max(block_k, 8 * group), K_per)
    while K_per % bk:
        bk //= 2
    if (bo < 128 or bk < max(group, 128) or bk % (8 * group) or bk % 128
            or K_per % 32 or in_f % group):
        _log_fallback(f"affine{bits}b/g{group}", lin.shape, "alignment")
        return None
    lead = x.shape[:-1]
    n_rows = 1
    for d in lead:
        n_rows *= d
    if n_rows > 256:
        # prefill-sized: compute-bound; see q4k_matmul (scoped-VMEM)
        _log_fallback(f"affine{bits}b/g{group}", lin.shape, "prefill")
        return None
    x2 = _pad_rows(x.reshape(-1, in_f), 8)
    y = _affine_matmul_padded(
        x2, lin.data[q_key], lin.data["scale"], lin.data[zs_key],
        bits=bits, group=group, block_o=bo, block_k=bk,
    )
    n = 1
    for d in lead:
        n *= d
    y = y[:n].reshape(*lead, out_f)
    b = lin.data.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# ----------------------------------------------------------------- Q5_K


def _q5k_hbit_kernel(x_ref, qh_ref, scale_ref, o_ref, acc_ref, *, block_k: int):
    """High-bit term of Q5_K: sum_i x[i] * scale[sub(i)] * hbit[i, o].

    qh is PLANE-MAJOR (pack_q5k): row r bit j = element j*(K/8) + r, so
    plane j of a k-tile contracts against a contiguous x slice at a static
    offset — unpack is shift/mask only, no sublane interleave. Scale is
    applied weight-side (bit*scale is the same VPU op count as a separate
    mul) so each plane is one full-depth MXU dot."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = pl.program_id(1)
    dt = x_ref.dtype
    K8 = x_ref.shape[1] // 8
    To = o_ref.shape[1]
    nsub = block_k // 32
    qh = qh_ref[...].astype(jnp.int32)  # [block_k, To]
    acc = acc_ref[...]
    for j in range(8):
        off = j * K8 + k * block_k
        bits = ((qh >> j) & 1).astype(dt)
        # scale rows slice at off//32: sublane-aligned because the caller
        # guarantees K8 % 256 == 0 and block_k == 256 (off//32 = j*K8/32 +
        # k*8, both terms multiples of 8) — Mosaic REQUIRES the static
        # multiple-of-8 proof; without the guarantee + hint it refuses with
        # "cannot statically prove that index in dimension 0 is a multiple
        # of 8" (seen on-chip, r3 kernel_sweep)
        sj = scale_ref[pl.dslice(pl.multiple_of(off // 32, 8), nsub), :].astype(dt)
        srep = jnp.broadcast_to(sj[:, None, :], (nsub, 32, To)).reshape(block_k, To)
        xj = x_ref[:, pl.dslice(pl.multiple_of(off, 128), block_k)]
        acc = acc + jnp.dot(xj, bits * srep, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    acc_ref[...] = acc

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_o", "block_k", "block_k8"))
def _q5k_matmul_padded(x, qs, qh, scale, minv, *, block_o: int, block_k: int,
                       block_k8: int):
    """w = scale*(nib + 16*hbit) - minv: nibble + min terms = the Q4_K
    kernel on qs/scale/minv (min fused in-kernel, r4); high-bit term =
    _q5k_hbit_kernel on the 1-bit planes (x16). Streams 5.06 bit/weight."""
    B, K = x.shape
    O = qs.shape[1]
    y = pl.pallas_call(
        functools.partial(_q4k_kernel, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((B, O), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(O // block_o, K // block_k),
            in_specs=[
                pl.BlockSpec((B, K), lambda o, k: (0, 0)),
                pl.BlockSpec((block_k // 2, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((K // 32, block_o), lambda o, k: (0, o)),
                pl.BlockSpec((K // 32, block_o), lambda o, k: (0, o)),
                pl.BlockSpec((K // 32, B), lambda o, k: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K // 2 + O * K // 32 * 4 + B * K * 2 + B * O * 2,
            transcendentals=0,
        ),
    )(x, qs, scale, minv, _xsum32_t(x))
    yh = pl.pallas_call(
        functools.partial(_q5k_hbit_kernel, block_k=block_k8),
        out_shape=jax.ShapeDtypeStruct((B, O), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(O // block_o, (K // 8) // block_k8),
            in_specs=[
                pl.BlockSpec((B, K), lambda o, k: (0, 0)),
                pl.BlockSpec((block_k8, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((K // 32, block_o), lambda o, k: (0, o)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K // 8 + O * K // 32 * 2 + B * K * 2 + B * O * 2,
            transcendentals=0,
        ),
    )(x, qh, scale)
    return y + 16.0 * yh


def _q5k_hbit_q8_kernel(xq_ref, qh_ref, scale_ref, xs_ref, o_ref, acc_ref, *,
                        block_k: int):
    """int8 variant of _q5k_hbit_kernel: the 1-bit planes contract against
    Q8 activations in per-32-sub-block int8 dots with the combined
    (weight x activation) scale on the int32 partials. Same plane-major
    layout + sublane-alignment contract (K8 % 256, block_k == 256)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = pl.program_id(1)
    K8 = xq_ref.shape[1] // 8
    nsub = block_k // 32
    qh = qh_ref[...].astype(jnp.int32)  # [block_k, To]
    acc = acc_ref[...]
    for j in range(8):
        off = j * K8 + k * block_k
        bits = ((qh >> j) & 1).astype(jnp.int8)
        xj = xq_ref[:, pl.dslice(pl.multiple_of(off, 128), block_k)]
        sj = scale_ref[pl.dslice(pl.multiple_of(off // 32, 8), nsub), :].astype(jnp.float32)
        xsj = xs_ref[pl.dslice(pl.multiple_of(off // 32, 8), nsub), :]  # [nsub, B]
        for i in range(nsub):
            p = jax.lax.dot_general(
                xj[:, 32 * i : 32 * i + 32], bits[32 * i : 32 * i + 32],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = acc + p.astype(jnp.float32) * xsj[i][:, None] * sj[i][None, :]
    acc_ref[...] = acc

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_o", "block_k", "block_k8",
                                             "out_dtype"))
def _q5k_q8_matmul_padded(x, qs, qh, scale, minv, *, block_o: int,
                          block_k: int, block_k8: int,
                          out_dtype=jnp.bfloat16):
    """Q8-activation int8 forward for Q5_K: the nibble + min terms ARE the
    Q4_K int8 path (identical paired-nibble layout); the high-bit term adds
    16 * (int8 1-bit-plane dots). The duplicate _quantize_acts_q8 CSEs under
    the shared jit trace."""
    B, K = x.shape
    O = qs.shape[1]
    y = _q4k_q8_matmul_padded(x, qs, scale, minv, block_o=block_o,
                              block_k=block_k, out_dtype=jnp.float32)
    xq, xs_t = _quantize_acts_q8(x)
    yh = pl.pallas_call(
        functools.partial(_q5k_hbit_q8_kernel, block_k=block_k8),
        out_shape=jax.ShapeDtypeStruct((B, O), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(O // block_o, (K // 8) // block_k8),
            in_specs=[
                pl.BlockSpec((B, K), lambda o, k: (0, 0)),
                pl.BlockSpec((block_k8, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((K // 32, block_o), lambda o, k: (0, o)),
                pl.BlockSpec((K // 32, B), lambda o, k: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K // 8 + O * K // 32 * 2 + B * K + B * O * 4,
            transcendentals=0,
        ),
    )(xq, qh, scale, xs_t)
    return (y + 16.0 * yh).astype(out_dtype)


def _use_q5k_int8() -> bool:
    """Default ON for TPU decode since r4: the on-chip A/B (dequant_ab3
    --q5k-int8, 12:56 UTC) measured 0.208 vs 0.265 ms at the 7B ffn GEMV
    (1.27x); parity was cleared on-chip in r3 and the epilogue-fused
    variant re-passed the r4 kernel gate. MISTRALRS_Q5K_INT8=0 reverts."""
    import os

    if os.environ.get("MISTRALRS_Q5K_INT8", "1") != "1":
        return False
    return jax.default_backend() == "tpu"


def q5k_matmul(lin: Linear, x: jax.Array, *, block_o: int = 1024, block_k: int = 1024) -> jax.Array:
    """Forward for kind 'gguf_q5k'. x [..., K] -> [..., O].

    block_o default from the r3 on-chip sweep at the 7B ffn GEMV (post
    alignment fix): (1024,1024) -> 0.692 ms vs (512,1024) -> 0.831
    (scripts/kernel_sweep.py)."""
    in_f, out_f = lin.shape
    lead = x.shape[:-1]
    bo, bk = _pick_blocks(out_f, in_f, block_o, block_k)
    K8 = in_f // 8
    # hbit planes: 256-element k-steps keep every scale row slice offset
    # (j*K8 + k*256)//32 a static multiple of 8 (requires K8 % 256 == 0,
    # i.e. in % 2048 == 0 — true for every 7B matmul shape); Mosaic rejects
    # unaligned sublane slice offsets on the real toolchain
    bk8 = min(256, K8)
    n_rows = 1
    for d in lead:
        n_rows *= d
    if bk < 512 or in_f % 512 or bk8 < 256 or K8 % 256 or n_rows > 256:
        # q4k paired kernel alignment (see q4k_matmul: in % 512) + hbit
        # plane/scale alignment (above);
        # n_rows > 256 = prefill-sized: see q4k_matmul (scoped-VMEM)
        from mistralrs_tpu.quant.gguf_linear import _ref_forward

        _log_fallback("q5k", lin.shape,
                      "prefill" if n_rows > 256 else "alignment")
        return _ref_forward(lin, x)
    x2 = _pad_rows(x.reshape(-1, in_f), 8)
    if _use_q5k_int8():
        y = _q5k_q8_matmul_padded(
            x2, lin.data["qs"], lin.data["qh"], lin.data["scale"],
            lin.data["minv"], block_o=bo, block_k=bk, block_k8=bk8,
            out_dtype=x.dtype,
        )
    else:
        y = _q5k_matmul_padded(
            x2, lin.data["qs"], lin.data["qh"], lin.data["scale"], lin.data["minv"],
            block_o=bo, block_k=bk, block_k8=bk8,
        )
    n = 1
    for d in lead:
        n *= d
    y = y[:n].reshape(*lead, out_f)
    b = lin.data.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# ----------------------------------------------------------------- Q6_K


def _q6k_kernel(x_ref, ql_ref, qh_ref, scale_ref, xsum16_ref, o_ref, acc_ref,
                *, G: int, natural: bool = True):
    """One chunk (4 spans of G permuted elements) per k-step. The chunked
    layout (quant/gguf_linear.py pack_q6k) makes every ref's block
    contiguous, so the unpack is mask/shift only with static bit offsets:
    ql rows [0,G) hold lownib(span0)|lownib(span2)<<4, rows [G,2G) spans
    1|3; qh packs the four 2-bit highs at bits 0/2/4/6. Scale is applied
    weight-side (per-16 sub-scales broadcast along sublanes, q8_0-style)
    and each span contracts as a full-depth [B,G]x[G,To] MXU dot.

    r4: x streams in NATURAL element order (full [B, K] resident, like the
    Q4_K kernel) — span j of chunk c lives at the contiguous natural slice
    j*(K/4) + c*G, so the former runtime [B, K] perm gather disappears.
    The -32 offset term (32 * sum_16(x) * s16) is fused as one tiny dot on
    the accumulator per k-step (xsum16 arrives in PERMUTED per-16 order —
    a static reshape/transpose outside, not a gather).

    natural=False keeps the legacy pre-gathered-x contract (x blocked
    [B, 4G] per chunk) for G=128 shapes (e.g. phi2's 2560) where the
    natural slice offsets can't satisfy Mosaic's alignment proofs."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    c = pl.program_id(1)
    K = x_ref.shape[1]
    Kq = K // 4
    dt = x_ref.dtype
    To = o_ref.shape[1]
    h = qh_ref[...].astype(jnp.int32)  # [G, To]
    acc = acc_ref[...] - 32.0 * _colsum_dot(
        xsum16_ref[...], scale_ref[...].astype(jnp.float32))
    # Unpack one span at a time so the live int32 temporaries are [G, To]
    # rather than [2G, To]×2 + 4×[G, To] at once — peak scoped-VMEM stack
    # stays bounded (prefill-sized calls used to OOM the 16 MiB default).
    for j in range(4):
        rows = pl.dslice((j % 2) * G, G)  # spans 0/2 in rows [0,G), 1/3 in [G,2G)
        qlj = ql_ref[rows, :].astype(jnp.int32)
        nib = (qlj & 0xF) if j < 2 else (qlj >> 4)
        qj = nib | (((h >> (2 * j)) & 3) << 4)
        sj = scale_ref[pl.dslice(j * (G // 16), G // 16), :]
        srep = jnp.broadcast_to(sj[:, None, :], (G // 16, 16, To)).reshape(G, To).astype(dt)
        w = qj.astype(dt) * srep
        if natural:
            xj = x_ref[:, pl.dslice(pl.multiple_of(j * Kq + c * G, 128), G)]
        else:
            xj = x_ref[:, pl.dslice(j * G, G)]
        acc = acc + jnp.dot(
            xj, w, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
        )
    acc_ref[...] = acc

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _q6k_q8_kernel(xq_ref, ql_ref, qh_ref, scale_ref, xs_ref, xsum16_ref,
                   o_ref, acc_ref, *, G: int):
    """int8-MXU Q6_K: same chunked layout as _q6k_kernel, but q (0..63 fits
    int8) contracts against Q8-quantized activations in 16-deep integer
    dots (Q6_K scales are per-16); activation scales are per-32, so each
    32-block combines its two 16-sub dots before the xs multiply.
    On-chip A/B (r3): 0.199 vs 0.222 ms at the 7B ffn GEMV — the 128
    16-deep dots per k-step lower fine; default ON for TPU decode.

    r4: xq streams in NATURAL element order (full [B, K] resident; span j
    of chunk c = contiguous slice at j*(K/4) + c*G) — no runtime perm
    gather. xs (per-32 activation scales) and xsum16 (per-16 sums of the
    ORIGINAL activations, for the fused -32 offset term) arrive in
    PERMUTED order via static reshape/transposes outside."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    c = pl.program_id(1)
    K = xq_ref.shape[1]
    Kq = K // 4
    h = qh_ref[...].astype(jnp.int32)  # [G, To]
    acc = acc_ref[...] - 32.0 * _colsum_dot(
        xsum16_ref[...], scale_ref[...].astype(jnp.float32))
    for j in range(4):
        rows = pl.dslice((j % 2) * G, G)
        qlj = ql_ref[rows, :].astype(jnp.int32)
        nib = (qlj & 0xF) if j < 2 else (qlj >> 4)
        qj = (nib | (((h >> (2 * j)) & 3) << 4)).astype(jnp.int8)  # 0..63
        sj = scale_ref[pl.dslice(j * (G // 16), G // 16), :].astype(jnp.float32)
        xsj = xs_ref[pl.dslice(j * (G // 32), G // 32), :]  # [G/32, B] f32
        xj = xq_ref[:, pl.dslice(pl.multiple_of(j * Kq + c * G, 128), G)]
        for m in range(G // 32):
            a = jax.lax.dot_general(
                xj[:, 32 * m : 32 * m + 16], qj[32 * m : 32 * m + 16],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            b = jax.lax.dot_general(
                xj[:, 32 * m + 16 : 32 * m + 32], qj[32 * m + 16 : 32 * m + 32],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            t = (a.astype(jnp.float32) * sj[2 * m][None, :]
                 + b.astype(jnp.float32) * sj[2 * m + 1][None, :])
            acc = acc + t * xsj[m][:, None]
    acc_ref[...] = acc

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _perm16_t(a_nat: jax.Array, C: int, G: int, gsz: int) -> jax.Array:
    """Natural per-gsz-block row vector [B, K/gsz] -> PERMUTED chunked
    order, transposed [K/gsz, B] f32. The q6k load permutation maps packed
    position (c, j, t) <-> natural element j*(K/4) + c*G + t; whole
    gsz-blocks map because G % gsz == 0, so this is a static reshape/
    transpose — NOT a gather (r4: the runtime [B, K] x-perm gather is
    gone; only these tiny per-block tensors get reordered)."""
    B = a_nat.shape[0]
    return (a_nat.reshape(B, 4, C, G // gsz).transpose(0, 2, 1, 3)
            .reshape(B, -1).T)


@functools.partial(jax.jit, static_argnames=("block_o", "G", "out_dtype"))
def _q6k_q8_matmul_padded(x, ql, qh, scale, *, block_o: int, G: int,
                          out_dtype=jnp.bfloat16):
    """Q8-activation int8 forward for Q6_K. x [B, K] in NATURAL element
    order (requires K % 1024 == 0, i.e. G >= 256 — always true when this
    path dispatches); the -32 offset term is fused in-kernel from per-16
    sums of the ORIGINAL activations."""
    B, K = x.shape
    O = ql.shape[1]
    C = K // (4 * G)
    xq, xs_t = _quantize_acts_q8(x)  # xs_t [K/32, B] natural order
    xs_p = _perm16_t(xs_t.T, C, G, 32)
    xsum16 = jnp.sum(x.astype(jnp.float32).reshape(B, K // 16, 16), axis=2)
    xsum16_p = _perm16_t(xsum16, C, G, 16)
    grid = (O // block_o, C)
    return pl.pallas_call(
        functools.partial(_q6k_q8_kernel, G=G),
        out_shape=jax.ShapeDtypeStruct((B, O), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((B, K), lambda o, k: (0, 0)),
                pl.BlockSpec((2 * G, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((G, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((G // 4, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((G // 8, B), lambda o, k: (k, 0)),
                pl.BlockSpec((G // 4, B), lambda o, k: (k, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K // 2 + O * K // 4 + O * K // 16 * 2 + B * K,
            transcendentals=0,
        ),
    )(xq, ql, qh, scale, xs_p, xsum16_p)


def _use_q6k_int8() -> bool:
    """Default ON for TPU decode after the r3 on-chip A/B: 0.199 vs 0.222 ms
    at the 7B ffn GEMV (1.12x — the per-16 scales make the int8 dots denser
    than Q4_K's, so the win is smaller). MISTRALRS_Q6K_INT8=0 reverts."""
    import os

    if os.environ.get("MISTRALRS_Q6K_INT8", "1") != "1":
        return False
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("block_o", "G", "natural"))
def _q6k_matmul_padded(x, ql, qh, scale, *, block_o: int, G: int,
                       natural: bool = True):
    """x [B, K] — NATURAL element order when natural=True (K % 1024 == 0),
    else pre-gathered by lin.data['perm'] (legacy G=128 contract);
    ql [K/2, O]; qh [K/4, O]; scale [K/16, O]. w = scale*(q-32): the -32
    offset term is fused in-kernel from per-16 activation sums (r4)."""
    B, K = x.shape
    O = ql.shape[1]
    C = K // (4 * G)
    xsum16 = jnp.sum(x.astype(jnp.float32).reshape(B, K // 16, 16), axis=2)
    # pre-gathered x already yields permuted-order per-16 sums
    xsum16_p = _perm16_t(xsum16, C, G, 16) if natural else xsum16.T
    grid = (O // block_o, C)
    x_spec = (pl.BlockSpec((B, K), lambda o, k: (0, 0)) if natural
              else pl.BlockSpec((B, 4 * G), lambda o, k: (0, k)))
    return pl.pallas_call(
        functools.partial(_q6k_kernel, G=G, natural=natural),
        out_shape=jax.ShapeDtypeStruct((B, O), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                x_spec,
                pl.BlockSpec((2 * G, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((G, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((G // 4, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((G // 4, B), lambda o, k: (k, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the 16 MiB default scoped limit is conservative; the unpack
            # temporaries + resident x tile need headroom at larger B
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K // 2 + O * K // 4 + O * K // 16 * 2 + B * K * 2 + B * O * 2,
            transcendentals=0,
        ),
    )(x, ql, qh, scale, xsum16_p)


def q6k_matmul(lin: Linear, x: jax.Array, *, block_o: int = 2048) -> jax.Array:
    """Forward for kind 'gguf_q6k'. x [..., K] -> [..., O].

    block_o default from the r3 on-chip sweep at the 7B ffn GEMV:
    2048 -> 0.710 ms vs 1024 -> 0.763, 512 -> 1.055 (scripts/kernel_sweep.py).
    """
    from mistralrs_tpu.quant.qlinear import unstack_layer

    in_f, out_f = lin.shape
    G = lin.meta
    lidx = lin.data.get("lidx")
    lead = x.shape[:-1]
    bo = min(block_o, out_f)
    while out_f % bo:
        bo //= 2
    n_rows = 1
    for d in lead:
        n_rows *= d
    if G is None or G < 128 or bo < 128 or n_rows > 256:
        # n_rows > 256 = prefill-sized calls: those are compute-bound, so the
        # dequant-then-XLA-dot path is the right one (weight expansion
        # amortizes over many tokens) and the GEMV kernel's resident x tile
        # [B, 4G] would crowd VMEM. G=64 shapes: the per-span scale-slice
        # offsets (j*G/16 = 4j sublanes) can't satisfy Mosaic's alignment.
        from mistralrs_tpu.quant.gguf_linear import _ref_forward

        _log_fallback("q6k", lin.shape,
                      "prefill" if n_rows > 256 else "alignment")
        return _ref_forward(unstack_layer(lin) if lidx is not None else lin, x)
    x2 = _pad_rows(x.reshape(-1, in_f), 8)
    # natural-order path (r4): G >= 256 <=> in % 1024 == 0 — every slice
    # offset proof holds and the runtime perm gather disappears
    natural = G >= 256
    if lidx is not None and not natural:
        lin = unstack_layer(lin)  # legacy G=128 gather contract
        lidx = None
    xin = x2 if natural else jnp.take(x2, lin.data["perm"], axis=1)
    # int8 only at small row counts: the int8 path's accumulator scale ops
    # cost B*To*(K/32) while the bf16 kernel's weight-side scaling is
    # B-independent — the r4 on-chip crossover at the 7B ffn GEMV:
    # B=8 int8 0.218 vs bf16 0.270 ms; B=32 int8 0.387 vs bf16 0.305
    # (layer_decompose2, 13:47 UTC)
    if _use_q6k_int8() and natural and n_rows <= 16:
        if lidx is not None:
            y = _q6k_q8_matmul_stacked(
                jnp.reshape(lidx, (1,)).astype(jnp.int32), xin,
                lin.data["ql"], lin.data["qh"], lin.data["scale"],
                block_o=bo, G=G, out_dtype=x.dtype,
            )
        else:
            y = _q6k_q8_matmul_padded(
                xin, lin.data["ql"], lin.data["qh"], lin.data["scale"],
                block_o=bo, G=G, out_dtype=x.dtype,
            )
    elif lidx is not None:
        y = _q6k_matmul_stacked(
            jnp.reshape(lidx, (1,)).astype(jnp.int32), xin,
            lin.data["ql"], lin.data["qh"], lin.data["scale"],
            block_o=bo, G=G,
        )
    else:
        y = _q6k_matmul_padded(
            xin, lin.data["ql"], lin.data["qh"], lin.data["scale"],
            block_o=bo, G=G, natural=natural,
        )
    n = 1
    for d in lead:
        n *= d
    y = y[:n].reshape(*lead, out_f)
    b = lin.data.get("b")
    if b is not None:
        if lidx is not None and b.ndim > 1:
            b = jnp.take(b, lidx, axis=0)
        y = y + b.astype(y.dtype)
    return y


# ----------------------------------------------------------------- Q8_0


def _q8_0_kernel(x_ref, q_ref, scale_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    q = q_ref[...].astype(x.dtype)  # [Kt, To] int8
    scale = scale_ref[...].astype(x.dtype)  # [Kt/32, To]
    nsub, To = scale.shape
    scale_rep = jnp.broadcast_to(scale[:, None, :], (nsub, 32, To)).reshape(nsub * 32, To)
    w = q * scale_rep
    acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_o", "block_k"))
def _q8_0_matmul_padded(x, q, scale, *, block_o: int, block_k: int):
    B, K = x.shape
    O = q.shape[1]
    grid = (O // block_o, K // block_k)
    return pl.pallas_call(
        _q8_0_kernel,
        out_shape=jax.ShapeDtypeStruct((B, O), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((B, block_k), lambda o, k: (0, k)),
                pl.BlockSpec((block_k, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((block_k // 32, block_o), lambda o, k: (k, o)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K + O * K // 32 * 4 + B * K * 2 + B * O * 2,
            transcendentals=0,
        ),
    )(x, q, scale)


def _q8_0_q8_kernel(xq_ref, q_ref, scale_ref, xs_ref, o_ref, acc_ref, *,
                    gs: int = 32):
    """int8-MXU Q8_0 / rq8: the weights are ALREADY int8 — zero unpack VPU
    work; the GEMV is per-gs-sub-block int8 dots with the combined
    (weight x activation) scale applied on the int32 partials.

    gs: the scale group size. 32 for wire-format Q8_0; 64 for the q6k->rq8
    requant layout (half the small-dot count per element of the Q4_K int8
    kernel — the r4 layer_decompose2 gap analysis points at small-dot
    issue cost, not DMA, as the limiter)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xq = xq_ref[...]  # [B, block_k] int8
    q = q_ref[...]  # [block_k, To] int8
    s = scale_ref[...].astype(jnp.float32)  # [nsub, To]
    xs = xs_ref[...]  # [nsub, B] f32
    nsub = s.shape[0]
    acc = acc_ref[...]
    for i in range(nsub):
        p = jax.lax.dot_general(
            xq[:, gs * i : gs * i + gs], q[gs * i : gs * i + gs],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = acc + p.astype(jnp.float32) * xs[i][:, None] * s[i][None, :]
    acc_ref[...] = acc

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _quantize_acts_q8_gs(x2d: jax.Array, gs: int) -> tuple[jax.Array, jax.Array]:
    """Per-gs-block activation int8 quantization (generalized
    _quantize_acts_q8; gs=32 matches it exactly)."""
    B, K = x2d.shape
    xf = x2d.astype(jnp.float32).reshape(B, K // gs, gs)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=2), 1e-10) / 127.0
    xq = jnp.clip(jnp.round(xf / xs[..., None]), -127, 127)
    return xq.astype(jnp.int8).reshape(B, K), xs.T


@functools.partial(jax.jit, static_argnames=("block_o", "block_k", "gs",
                                             "out_dtype"))
def _q8_0_q8_matmul_padded(x, q, scale, *, block_o: int, block_k: int,
                           gs: int = 32, out_dtype=jnp.bfloat16):
    """Q8-activation int8 forward for Q8_0/rq8 (w = q*scale is
    zero-symmetric: no min term at all)."""
    B, K = x.shape
    O = q.shape[1]
    xq, xs_t = _quantize_acts_q8_gs(x, gs)
    return pl.pallas_call(
        functools.partial(_q8_0_q8_kernel, gs=gs),
        out_shape=jax.ShapeDtypeStruct((B, O), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(O // block_o, K // block_k),
            in_specs=[
                pl.BlockSpec((B, block_k), lambda o, k: (0, k)),
                pl.BlockSpec((block_k, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((block_k // gs, block_o), lambda o, k: (k, o)),
                pl.BlockSpec((block_k // gs, B), lambda o, k: (k, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K + O * K // gs * 2 + B * K + B * O * 2,
            transcendentals=0,
        ),
    )(xq, q, scale, xs_t)


@functools.partial(jax.jit, static_argnames=("block_o", "block_k", "gs",
                                             "out_dtype"))
def _q8_0_q8_matmul_stacked(lidx, x, q, scale, *, block_o: int, block_k: int,
                            gs: int = 32, out_dtype=jnp.bfloat16):
    """Stacked-layer int8 Q8_0/rq8 forward: q [L, K, O] int8,
    scale [L, K/gs, O]; lidx scalar-prefetch selects the layer (zero-copy
    streaming from the stacked array, like _q4k_q8_matmul_stacked)."""
    B, K = x.shape
    O = q.shape[2]
    xq, xs_t = _quantize_acts_q8_gs(x, gs)

    def kern(s_ref, *refs):
        return _q8_0_q8_kernel(*refs, gs=gs)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, O), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(O // block_o, K // block_k),
            in_specs=[
                pl.BlockSpec((B, block_k), lambda o, k, s: (0, k)),
                pl.BlockSpec((None, block_k, block_o),
                             lambda o, k, s: (s[0], k, o)),
                pl.BlockSpec((None, block_k // gs, block_o),
                             lambda o, k, s: (s[0], k, o)),
                pl.BlockSpec((block_k // gs, B), lambda o, k, s: (k, 0)),
            ],
            out_specs=pl.BlockSpec((B, block_o), lambda o, k, s: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * O * K,
            bytes_accessed=O * K + O * K // gs * 2 + B * K + B * O * 2,
            transcendentals=0,
        ),
    )(lidx, xq, q, scale, xs_t)


def _use_q8_0_int8() -> bool:
    """Default ON for TPU since r5: with block_o=1024 and the stacked
    variant the int8 path is the q6k->rq8 serving route; the r4 A/B that
    measured it a wash (301 vs 290 GB/s) ran block_o=512 (the BF16
    kernel's sweep optimum). MISTRALRS_Q8_0_INT8=0 reverts."""
    import os

    if os.environ.get("MISTRALRS_Q8_0_INT8", "1") != "1":
        return False
    return jax.default_backend() == "tpu"


def q8_0_matmul(lin: Linear, x: jax.Array, *, block_o: int = 512, block_k: int = 1024) -> jax.Array:
    """Forward for kind 'gguf_q8_0' (wire Q8_0 OR the q6k->rq8 requant
    layout: meta carries the scale group size, None/32 = wire). Accepts
    stacked-layer Linears on the int8 route (data [L, ...] + "lidx")."""
    from mistralrs_tpu.quant.qlinear import unstack_layer

    in_f, out_f = lin.shape
    gs = lin.meta or 32
    lidx = lin.data.get("lidx")
    lead = x.shape[:-1]
    n_rows = 1
    for d in lead:
        n_rows *= d
    if n_rows > 256:
        # prefill-sized: compute-bound; see q4k_matmul (scoped-VMEM)
        from mistralrs_tpu.quant.gguf_linear import _ref_forward

        _log_fallback("q8_0", lin.shape, "prefill")
        return _ref_forward(unstack_layer(lin) if lidx is not None else lin, x)
    x2 = _pad_rows(x.reshape(-1, in_f), 8)
    if _use_q8_0_int8() and in_f % max(gs, 512) == 0:
        # int8 route: block_o=1024 (the q4k int8 sweep optimum — the old
        # 512 default came from the BF16 kernel's sweep and left ~35% of
        # the q4k-path rate on the table)
        bo, bk = _pick_blocks(out_f, in_f, max(block_o, 1024), block_k)
        if lidx is not None:
            y = _q8_0_q8_matmul_stacked(
                jnp.reshape(lidx, (1,)).astype(jnp.int32), x2,
                lin.data["q"], lin.data["scale"],
                block_o=bo, block_k=bk, gs=gs, out_dtype=x.dtype)
        else:
            y = _q8_0_q8_matmul_padded(
                x2, lin.data["q"], lin.data["scale"],
                block_o=bo, block_k=bk, gs=gs, out_dtype=x.dtype)
    else:
        bo, bk = _pick_blocks(out_f, in_f, block_o, block_k)
        if lidx is not None:
            lin = unstack_layer(lin)
        if gs != 32:
            # bf16 route only knows the wire per-32 layout
            from mistralrs_tpu.quant.gguf_linear import _ref_forward

            _log_fallback("q8_0", lin.shape, f"gs={gs} bf16 route")
            return _ref_forward(lin, x)
        y = _q8_0_matmul_padded(x2, lin.data["q"], lin.data["scale"], block_o=bo, block_k=bk)
    n = 1
    for d in lead:
        n *= d
    y = y[:n].reshape(*lead, out_f)
    b = lin.data.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
