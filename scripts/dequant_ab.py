"""Single-stream dequant-floor experiments on hardware (VERDICT r1 weak #2).

The Q4_K decode kernel is VPU-dequant-bound (~2.5 ops/element for
uint8 -> int32 -> mask/shift -> bf16; PERF.md roofline). This measures the
alternatives instead of assuming them:

A. Mosaic cast re-probe — one tiny Pallas kernel per cast the toolchain
   rejected in round 1 (uint8->bf16/f16/f32/int16, int32->int8, int8 MXU
   dot, int4 dtype). Prints OK/FAIL per cast; any new OK reopens the
   cheaper unpack paths.
B. LUT unpack — dequant via a 16-entry table gather (jnp.take) instead of
   the arithmetic chain; timed against the current chain on one tile shape.
C. int8-MXU prototype — unpack nibbles to int8 (one cast fewer than to
   bf16) and contract with pre-quantized int8 activations on the MXU
   (int32 accumulation). TIMING-ONLY prototype: activation quantization
   error is not compensated, so this bounds the speedup, not the accuracy
   (ggml Q8_0-activation style, ref ggml-quants.c vec_dot).

Timing per the axon rules: 100-iter chained lax.scan, one np.asarray fetch.
Run: python scripts/dequant_ab.py  (expects the TPU tunnel up)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

ITERS = 100


def _probe_casts():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel_factory(body):
        def kern(i_ref, o_ref):
            o_ref[...] = body(i_ref[...])

        return kern

    u8 = jnp.arange(8 * 128, dtype=jnp.uint8).reshape(8, 128)
    i32 = u8.astype(jnp.int32)
    i8 = jnp.ones((128, 128), jnp.int8)
    cases = [
        ("uint8->bf16", u8, lambda v: v.astype(jnp.bfloat16), jnp.bfloat16),
        ("uint8->f16", u8, lambda v: v.astype(jnp.float16), jnp.float16),
        ("uint8->f32", u8, lambda v: v.astype(jnp.float32), jnp.float32),
        ("uint8->int16", u8, lambda v: v.astype(jnp.int16), jnp.int16),
        ("int32->int8", i32, lambda v: v.astype(jnp.int8), jnp.int8),
        ("uint8->int4", u8, lambda v: (v & 0xF).astype(jnp.int4), jnp.int4),
    ]
    for name, inp, body, odt in cases:
        try:
            out = pl.pallas_call(
                kernel_factory(body),
                out_shape=jax.ShapeDtypeStruct(inp.shape, odt),
            )(inp)
            np.asarray(out.astype(jnp.int32))
            print(f"cast {name:14s}: OK", flush=True)
        except Exception as e:
            print(f"cast {name:14s}: FAIL {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
    # int8 x int8 MXU dot
    try:
        def dot_kern(a_ref, b_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        out = pl.pallas_call(
            dot_kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        )(i8, i8)
        np.asarray(out)
        print("int8xint8 MXU dot : OK", flush=True)
    except Exception as e:
        print(f"int8xint8 MXU dot : FAIL {type(e).__name__}: {str(e)[:90]}",
              flush=True)


def _time_scan(f, x) -> float:
    """ITERS chained f applications; returns seconds per application."""
    import jax

    def step(h, _):
        return f(h), None

    g = jax.jit(lambda v: jax.lax.scan(step, v, None, length=ITERS)[0])
    np.asarray(g(x))
    t0 = time.time()
    np.asarray(g(x))
    return (time.time() - t0) / ITERS


def _lut_vs_chain():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    K2, O = 2048, 1024  # one 4096-K tile of packed bytes
    qs = jnp.asarray(np.random.default_rng(0).integers(0, 256, (K2, O)),
                     jnp.uint8)

    def chain_kern(q_ref, o_ref):
        q32 = q_ref[...].astype(jnp.int32)
        lo = (q32 & 0xF).astype(jnp.bfloat16)
        hi = (q32 >> 4).astype(jnp.bfloat16)
        o_ref[...] = (lo.sum() + hi.sum()).reshape(1, 1).astype(jnp.float32)

    def lut_kern(q_ref, lut_ref, o_ref):
        q32 = q_ref[...].astype(jnp.int32)
        lut = lut_ref[0, :16]
        lo = jnp.take(lut, q32 & 0xF, axis=0)
        hi = jnp.take(lut, q32 >> 4, axis=0)
        o_ref[...] = (lo.sum() + hi.sum()).reshape(1, 1).astype(jnp.float32)

    lut = jnp.arange(128, dtype=jnp.bfloat16).reshape(1, 128)
    for name, fn in [
        ("arith chain", lambda q: pl.pallas_call(
            chain_kern, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))(q)),
        ("16-LUT take", lambda q: pl.pallas_call(
            lut_kern, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))(q, lut)),
    ]:
        try:
            # re-feed qs each iter via a data-dependent no-op to defeat CSE
            dt = _time_scan(lambda s: s + fn(qs)[0, 0].astype(jnp.float32) * 0,
                            jnp.zeros((), jnp.float32))
            print(f"unpack {name}: {dt * 1e6:8.1f} us/tile "
                  f"({K2 * O * 2 / dt / 1e9:.0f} Gelem/s)", flush=True)
        except Exception as e:
            print(f"unpack {name}: FAIL {type(e).__name__}: {str(e)[:90]}",
                  flush=True)


def _int8_proto():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mistralrs_tpu.ops.quant_matmul import _q4k_matmul_padded

    rng = np.random.default_rng(1)
    K, O = 4096, 14336
    bo, bk = 1024, 1024
    qs = jnp.asarray(rng.integers(0, 256, (K // 2, O)), jnp.uint8)
    scale = jnp.asarray(rng.standard_normal((K // 32, O)) * 0.01, jnp.bfloat16)
    minv = jnp.asarray(rng.standard_normal((K // 32, O)) * 0.01, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)

    dt = _time_scan(
        lambda v: _q4k_matmul_padded(v, qs, scale, minv, block_o=bo,
                                     block_k=bk)[:, :K] * 0 + v,
        x)
    print(f"current bf16-unpack GEMV [{K}x{O}]: {dt * 1e3:7.3f} ms", flush=True)

    def int8_kern(x_ref, qs_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        k = pl.program_id(1)
        bkh = bk // 2
        Khalf = K // 2
        q32 = qs_ref[...].astype(jnp.int32)
        lo = ((q32 & 0xF) - 8).astype(jnp.int8)
        hi = ((q32 >> 4) - 8).astype(jnp.int8)
        x1 = x_ref[:, pl.dslice(pl.multiple_of(k * bkh, 128), bkh)]
        x2 = x_ref[:, pl.dslice(pl.multiple_of(Khalf + k * bkh, 128), bkh)]
        acc_ref[...] += (
            jax.lax.dot_general(x1, lo, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            + jax.lax.dot_general(x2, hi, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32))

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...]

    @jax.jit
    def int8_gemv(xq_in):
        return pl.pallas_call(
            int8_kern,
            out_shape=jax.ShapeDtypeStruct((8, O), jnp.int32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(O // bo, K // bk),
                in_specs=[
                    pl.BlockSpec((8, K), lambda o, k: (0, 0)),
                    pl.BlockSpec((bk // 2, bo), lambda o, k: (k, o)),
                ],
                out_specs=pl.BlockSpec((8, bo), lambda o, k: (0, o)),
                scratch_shapes=[pltpu.VMEM((8, bo), jnp.int32)],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(xq_in, qs)

    try:
        dt8 = _time_scan(
            lambda v: (int8_gemv(v).astype(jnp.int8)[:, :K] * 0 + v), xq)
        print(f"int8-MXU prototype GEMV [{K}x{O}]: {dt8 * 1e3:7.3f} ms "
              "(timing-only; activation quant uncompensated)", flush=True)
    except Exception as e:
        print(f"int8-MXU prototype: FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)


if __name__ == "__main__":
    print("== A. Mosaic cast re-probe ==", flush=True)
    _probe_casts()
    print("== B. LUT vs arithmetic unpack ==", flush=True)
    _lut_vs_chain()
    print("== C. int8-MXU GEMV prototype ==", flush=True)
    _int8_proto()
