"""Decompose the Q4_K decode kernel's time and race exact-math variants.

VERDICT r2 next-step #1: single-stream decode is 25.7 tok/s vs a measured
~140 tok/s streaming floor, and batch-16 shares the same ~39 ms step. This
harness answers, on the real chip, WHERE the time goes in the current
Q4_K kernel and which redesign wins, at the 7B ffn GEMV shape [4096x14336]:

Decomposition (timing-only kernels, same BlockSpecs => same DMA stream):
  E0 stream     — load qs tiles, touch 8 rows        (~pure HBM stream)
  E1 unpack     — full uint8->int32->mask/shift->bf16 chain, ones-dot
                  to keep Mosaic from DCE-ing the unpack  (stream + VPU)
  E2 dot-full   — unpacked values into ONE depth-bkh dot per half,
                  no scales                      (stream + VPU + big MXU)

Exact-math candidates (greedy-parity-checked vs the current kernel here):
  E3 ws-scale   — weight-side scale broadcast + full-depth dots
                  (the affine-kernel pattern; 2 dots/tile vs 32)
  E4 current    — per-sub accumulator scale, 32-deep dots (baseline)

XLA-level probes (no Pallas; is the custom kernel even needed?):
  E5 xla-int4   — jnp.dot(x, w4.astype(bf16)): does XLA fuse the convert
                  into the matmul loop (packed stream) or materialize?
  E6 xla-int4s  — same plus the per-32 scale broadcast multiply
  E7 xla-int8   — jnp.dot(x, w8.astype(bf16)) fusion probe

Timing per the axon rules (PERF.md): chained lax.scan, one np.asarray
fetch; block_until_ready is a no-op on this backend.
Run: python scripts/dequant_ab2.py  (expects the TPU tunnel up)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

ITERS = 50
K, O = 4096, 14336
BO, BK = 1024, 1024
B = 8


def _time_scan(f, x, *ws) -> float:
    """Weights passed as ARGS — closed-over device arrays become jit
    constants and the axon AOT compile ships them through the tunnel."""
    import jax

    g = jax.jit(lambda v, *w: jax.lax.scan(
        lambda h, _: (f(h, *w), None), v, None, length=ITERS)[0])
    np.asarray(g(x, *ws))
    t0 = time.time()
    np.asarray(g(x, *ws))
    return (time.time() - t0) / ITERS


def _inputs():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.integers(0, 256, (K // 2, O)), jnp.uint8)
    scale = jnp.asarray(rng.standard_normal((K // 32, O)) * 0.01, jnp.bfloat16)
    minv = jnp.asarray(rng.standard_normal((K // 32, O)) * 0.01, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, K)) * 0.1, jnp.bfloat16)
    return qs, scale, minv, x


def _specs(with_scale: bool):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_specs = [
        pl.BlockSpec((B, K), lambda o, k: (0, 0)),
        pl.BlockSpec((BK // 2, BO), lambda o, k: (k, o)),
    ]
    if with_scale:
        in_specs.append(pl.BlockSpec((K // 32, BO), lambda o, k: (0, o)))
    return dict(
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(O // BO, K // BK),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B, BO), lambda o, k: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, BO), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )


def _run_pallas(kern, with_scale, args, label):
    import jax
    from jax.experimental import pallas as pl

    qs, scale, minv, x = args

    def f(xin, qs, scale):
        import jax.numpy as jnp

        ops = (xin, qs, scale) if with_scale else (xin, qs)
        y = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((B, O), xin.dtype),
            **_specs(with_scale))(*ops)
        # data-dependence so scan can't CSE across iterations
        return xin + y[:, :K] * 0

    try:
        dt = _time_scan(f, x, qs, scale)
        gbs = (K // 2 * O + (K // 32 * O * 2 if with_scale else 0)) / dt / 1e9
        print(f"{label:12s}: {dt * 1e3:7.3f} ms  ({gbs:5.0f} GB/s packed)",
              flush=True)
        return dt
    except Exception as e:
        print(f"{label:12s}: FAIL {type(e).__name__}: {str(e)[:110]}", flush=True)
        return None


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    args = _inputs()
    qs, scale, minv, x = args

    # ---- E0 stream-only (uint8 -> f32 needs the int32 intermediary on
    # this toolchain)
    def e0(x_ref, qs_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += qs_ref[0:B, :].astype(jnp.int32).astype(jnp.float32)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    # ---- E1 unpack, ones-dot to defeat DCE (8-deep dot ~ free)
    def e1(x_ref, qs_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        dt = x_ref.dtype
        q32 = qs_ref[...].astype(jnp.int32)
        lo = (q32 & 0xF).astype(dt)
        hi = (q32 >> 4).astype(dt)
        v = lo + hi  # [BK//2, BO]
        # fold sublanes with a log-tree of strided adds (VPU, ~1 op/row)
        r = v
        n = BK // 2
        while n > B:
            n //= 2
            r = r[:n, :] + r[n : 2 * n, :]
        acc_ref[...] += r.astype(jnp.float32)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    # ---- E2 unpack + full-depth dots, no scale
    def e2(x_ref, qs_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        k = pl.program_id(1)
        bkh = BK // 2
        Khalf = x_ref.shape[1] // 2
        dt = x_ref.dtype
        q32 = qs_ref[...].astype(jnp.int32)
        lo = (q32 & 0xF).astype(dt)
        hi = (q32 >> 4).astype(dt)
        x1 = x_ref[:, pl.dslice(pl.multiple_of(k * bkh, 128), bkh)]
        x2 = x_ref[:, pl.dslice(pl.multiple_of(Khalf + k * bkh, 128), bkh)]
        acc_ref[...] += (
            jnp.dot(x1, lo, preferred_element_type=jnp.float32)
            + jnp.dot(x2, hi, preferred_element_type=jnp.float32))

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    # ---- E3 weight-side scale + full-depth dots (EXACT candidate)
    def e3(x_ref, qs_ref, scale_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        k = pl.program_id(1)
        bkh = BK // 2
        Khalf = x_ref.shape[1] // 2
        nsub = bkh // 32
        To = BO
        dt = x_ref.dtype
        q32 = qs_ref[...].astype(jnp.int32)
        lo = (q32 & 0xF).astype(dt)
        hi = (q32 >> 4).astype(dt)
        s1 = scale_ref[pl.dslice(pl.multiple_of(k * nsub, 8), nsub), :].astype(dt)
        s2 = scale_ref[
            pl.dslice(pl.multiple_of((Khalf + k * bkh) // 32, 8), nsub), :
        ].astype(dt)
        s1r = jnp.broadcast_to(s1[:, None, :], (nsub, 32, To)).reshape(bkh, To)
        s2r = jnp.broadcast_to(s2[:, None, :], (nsub, 32, To)).reshape(bkh, To)
        x1 = x_ref[:, pl.dslice(pl.multiple_of(k * bkh, 128), bkh)]
        x2 = x_ref[:, pl.dslice(pl.multiple_of(Khalf + k * bkh, 128), bkh)]
        acc_ref[...] += (
            jnp.dot(x1, lo * s1r, preferred_element_type=jnp.float32)
            + jnp.dot(x2, hi * s2r, preferred_element_type=jnp.float32))

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    # ---- E8 int32-packed word layout: same bytes, loaded as int32 words
    # (4 byte-planes per word), unpacked with shift/mask only — tests the
    # hypothesis that the uint8->int32 CAST RELAYOUT (sublane 4:1 unpack),
    # not the arithmetic, dominates the kernel time. Timing-only: planes
    # dot against x slices of the right shape (exact math would need the
    # matching load-time repack).
    qs32 = jnp.asarray(
        np.random.default_rng(3).integers(0, 2**31, (K // 8, O), np.int64)
        .astype(np.int32))

    def e8(x_ref, q_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        k = pl.program_id(1)
        bkw = BK // 8  # int32 words per k-step
        K8 = x_ref.shape[1] // 8
        dt = x_ref.dtype
        w32 = q_ref[...]  # [bkw, BO] int32
        acc = acc_ref[...]
        for p in range(4):  # byte plane
            byte = (w32 >> (8 * p)) & 0xFF
            lo = (byte & 0xF).astype(dt)
            hi = (byte >> 4).astype(dt)
            x1 = x_ref[:, pl.dslice(pl.multiple_of(p * K8 + k * bkw, 128), bkw)]
            x2 = x_ref[:, pl.dslice(
                pl.multiple_of((4 + p) * K8 + k * bkw, 128), bkw)]
            acc = acc + (
                jnp.dot(x1, lo, preferred_element_type=jnp.float32)
                + jnp.dot(x2, hi, preferred_element_type=jnp.float32))
        acc_ref[...] = acc

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def _specs32():
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        return dict(
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(O // BO, K // BK),
                in_specs=[
                    pl.BlockSpec((B, K), lambda o, k: (0, 0)),
                    pl.BlockSpec((BK // 8, BO), lambda o, k: (k, o)),
                ],
                out_specs=pl.BlockSpec((B, BO), lambda o, k: (0, o)),
                scratch_shapes=[pltpu.VMEM((B, BO), jnp.float32)],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

    def run_e8():
        def f(xin, q32):
            y = pl.pallas_call(
                e8, out_shape=jax.ShapeDtypeStruct((B, O), xin.dtype),
                **_specs32())(xin, q32)
            return xin + y[:, :K] * 0

        try:
            dt = _time_scan(f, x, qs32)
            print(f"{'E8 i32-words':12s}: {dt * 1e3:7.3f} ms "
                  f"({K // 2 * O / dt / 1e9:5.0f} GB/s packed)", flush=True)
        except Exception as e:
            print(f"{'E8 i32-words':12s}: FAIL {type(e).__name__}: "
                  f"{str(e)[:110]}", flush=True)

    # ---- scan-floor calibration (the ~170us/iter axon scan floor rides on
    # every number here; subtract it when comparing against roofline)
    floor = _time_scan(lambda v: v + 1.0, x)
    print(f"{'scan floor':12s}: {floor * 1e3:7.3f} ms/iter", flush=True)

    print("== decomposition at [K=4096, O=14336], bo=bk=1024, B=8 ==",
          flush=True)
    _run_pallas(e0, False, args, "E0 stream")
    _run_pallas(e1, False, args, "E1 unpack")
    _run_pallas(e2, False, args, "E2 dot-full")
    dt3 = _run_pallas(e3, True, args, "E3 ws-scale")
    run_e8()

    from mistralrs_tpu.ops.quant_matmul import _q4k_matmul_padded

    def cur(xin, qs, scale, minv):
        y = _q4k_matmul_padded(xin, qs, scale, minv, block_o=BO, block_k=BK)
        return xin + y[:, :K] * 0

    dt4 = _time_scan(cur, x, qs, scale, minv)
    print(f"{'E4 current':12s}: {dt4 * 1e3:7.3f} ms", flush=True)

    # exact-math check: E3 + min-term == current
    def e3_full(xin):
        y = pl.pallas_call(
            e3, out_shape=jax.ShapeDtypeStruct((B, O), xin.dtype),
            **_specs(True))(xin, qs, scale)
        xsum = jnp.sum(xin.astype(jnp.float32).reshape(B, K // 32, 32), axis=2)
        return y - jnp.dot(xsum, minv.astype(jnp.float32)).astype(y.dtype)

    try:
        got = np.asarray(jax.jit(e3_full)(x), np.float32)
        want = np.asarray(
            _q4k_matmul_padded(x, qs, scale, minv, block_o=BO, block_k=BK),
            np.float32)
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        print(f"E3 vs current rel-err: {err:.2e}", flush=True)
    except Exception as e:
        print(f"E3 parity: FAIL {type(e).__name__}: {str(e)[:110]}", flush=True)

    # ---- XLA-level int4/int8 fusion probes
    print("== XLA weight-dtype fusion probes ==", flush=True)
    rng = np.random.default_rng(2)
    # calibration: plain bf16 GEMV at the same shape — the achievable
    # streaming rate for THIS shape class, not the 549 GB/s big-matmul rate
    try:
        wbf = jax.jit(lambda: (jax.random.normal(
            jax.random.key(5), (K, O), jnp.bfloat16) * 0.02))()

        def xlabf(xin, w):
            return xin + jnp.dot(xin, w)[:, :K] * 0

        dt = _time_scan(xlabf, x, wbf)
        print(f"{'E9 xla-bf16':12s}: {dt * 1e3:7.3f} ms "
              f"({K * O * 2 / dt / 1e9:5.0f} GB/s dense)", flush=True)
    except Exception as e:
        print(f"E9 xla-bf16 : FAIL {type(e).__name__}: {str(e)[:110]}", flush=True)
    w4 = None
    try:
        # int4 created ON DEVICE (host->device transfer of int4 hit a
        # RecursionError in the axon plugin in the first run)
        w4 = jax.jit(lambda: jax.random.randint(
            jax.random.key(4), (K, O), -8, 8, jnp.int8).astype(jnp.int4))()

        def xla4(xin, w4):
            return xin + jnp.dot(xin, w4.astype(jnp.bfloat16))[:, :K] * 0

        dt = _time_scan(xla4, x, w4)
        print(f"{'E5 xla-int4':12s}: {dt * 1e3:7.3f} ms "
              f"({K * O / 2 / dt / 1e9:5.0f} GB/s if packed-stream)", flush=True)
    except Exception as e:
        print(f"E5 xla-int4 : FAIL {type(e).__name__}: {str(e)[:110]}", flush=True)
    try:
        if w4 is None:
            raise RuntimeError("int4 array unavailable (E5 failed)")
        sb = jnp.asarray(rng.standard_normal((K // 32, 1, O)) * 0.01, jnp.bfloat16)

        def xla4s(xin, w4, sb):
            w = (w4.astype(jnp.bfloat16).reshape(K // 32, 32, O) * sb
                 ).reshape(K, O)
            return xin + jnp.dot(xin, w)[:, :K] * 0

        dt = _time_scan(xla4s, x, w4, sb)
        print(f"{'E6 xla-int4s':12s}: {dt * 1e3:7.3f} ms", flush=True)
    except Exception as e:
        print(f"E6 xla-int4s: FAIL {type(e).__name__}: {str(e)[:110]}", flush=True)
    try:
        w8 = jnp.asarray(rng.integers(-128, 128, (K, O)), jnp.int8)

        def xla8(xin, w8):
            return xin + jnp.dot(xin, w8.astype(jnp.bfloat16))[:, :K] * 0

        dt = _time_scan(xla8, x, w8)
        print(f"{'E7 xla-int8':12s}: {dt * 1e3:7.3f} ms "
              f"({K * O / dt / 1e9:5.0f} GB/s if packed-stream)", flush=True)
    except Exception as e:
        print(f"E7 xla-int8 : FAIL {type(e).__name__}: {str(e)[:110]}", flush=True)


if __name__ == "__main__":
    main()
