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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mistralrs_tpu.quant.qlinear import Linear


def _unpack_q4_kmajor(qs: jax.Array, dtype) -> jax.Array:
    """[Kt/2, To] packed nibbles -> [Kt, To] values 0..15 in ggml order.

    Byte row 32c+r holds elements 64c+r (lo) and 64c+32+r (hi): concat lo/hi
    per 32-row chunk on the sublane axis only (lanes untouched)."""
    in_half, To = qs.shape
    nchunk = in_half // 32
    q32 = qs.astype(jnp.int32)  # Mosaic has no uint8->bf16 cast; go via int32
    lo = (q32 & 0xF).astype(dtype).reshape(nchunk, 32, To)
    hi = (q32 >> 4).astype(dtype).reshape(nchunk, 32, To)
    return jnp.concatenate([lo, hi], axis=1).reshape(nchunk * 64, To)


def _q4k_kernel(x_ref, qs_ref, scale_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # [B, Kt]
    q = _unpack_q4_kmajor(qs_ref[...], x.dtype)  # [Kt, To]
    scale = scale_ref[...].astype(x.dtype)  # [Kt/32, To]
    nsub, To = scale.shape
    scale_rep = jnp.broadcast_to(scale[:, None, :], (nsub, 32, To)).reshape(nsub * 32, To)
    w = q * scale_rep  # [Kt, To]
    acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_o", "block_k"))
def _q4k_matmul_padded(x, qs, scale, minv, *, block_o: int, block_k: int):
    """x [B, K]; qs [K/2, O]; scale/minv [K/32, O]. Returns [B, O]."""
    B, K = x.shape
    O = qs.shape[1]
    grid = (O // block_o, K // block_k)
    y = pl.pallas_call(
        _q4k_kernel,
        out_shape=jax.ShapeDtypeStruct((B, O), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((B, block_k), lambda o, k: (0, k)),
                pl.BlockSpec((block_k // 2, block_o), lambda o, k: (k, o)),
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
            bytes_accessed=O * K // 2 + O * K // 32 * 2 + B * K * 2 + B * O * 2,
            transcendentals=0,
        ),
    )(x, qs, scale)
    # min-term correction (plain XLA): y -= xsum @ minv
    xsum = jnp.sum(x.astype(jnp.float32).reshape(B, K // 32, 32), axis=2)
    return y - jnp.dot(xsum, minv.astype(jnp.float32)).astype(y.dtype)


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


def q4k_matmul(lin: Linear, x: jax.Array, *, block_o: int = 512, block_k: int = 1024) -> jax.Array:
    """Forward for kind 'gguf_q4k'. x [..., K] -> [..., O]."""
    in_f, out_f = lin.shape
    lead = x.shape[:-1]
    x2 = _pad_rows(x.reshape(-1, in_f), 8)
    bo, bk = _pick_blocks(out_f, in_f, block_o, block_k)
    y = _q4k_matmul_padded(
        x2, lin.data["qs"], lin.data["scale"], lin.data["minv"], block_o=bo, block_k=bk
    )
    n = 1
    for d in lead:
        n *= d
    y = y[:n].reshape(*lead, out_f)
    b = lin.data.get("b")
    if b is not None:
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
    acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)

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


def q8_0_matmul(lin: Linear, x: jax.Array, *, block_o: int = 512, block_k: int = 1024) -> jax.Array:
    in_f, out_f = lin.shape
    lead = x.shape[:-1]
    x2 = _pad_rows(x.reshape(-1, in_f), 8)
    bo, bk = _pick_blocks(out_f, in_f, block_o, block_k)
    y = _q8_0_matmul_padded(x2, lin.data["q"], lin.data["scale"], block_o=bo, block_k=bk)
    n = 1
    for d in lead:
        n *= d
    y = y[:n].reshape(*lead, out_f)
    b = lin.data.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
