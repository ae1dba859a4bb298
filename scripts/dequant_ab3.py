"""Third dequant measurement wave: resolve kernel op time under the fog.

step_decompose.py put the weights path at 0.845 ms/tok/layer (~130 GB/s
effective) and dequant_ab2 showed E0 (stream-only) ~= E4 (full kernel):
the q4k GEMV is DMA/grid-bound, not VPU-bound — while XLA's dense bf16
GEMV at the same shape streams near spec. The earlier sweeps used
ITERS=50-100, so the fluctuating 20-50 ms dispatch overhead hid <10%
op-time differences. This wave uses ITERS=400 chained in-jit (overhead
< 0.15 ms/iter even at 50 ms) and 3 interleaved repeats with medians.

Measured per variant, 7B ffn GEMV [4096, 14336], B=8:
  stream(bo,bk)   — DMA-only kernel at several tile shapes
  q4k(bo,bk)      — current kernel at several tile shapes
  ws(2048,1024)   — weight-side scale full-depth-dot variant
  int8(bo,bk)     — int8-MXU full-depth prototype (timing bound)
  xla-bf16        — dense GEMV ceiling
  q6k(bo)         — q6k kernel tile check at 2048/4096

Run: python scripts/dequant_ab3.py  (expects the TPU tunnel up)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

ITERS = 400
REPS = 3
K, O = 4096, 14336
B = 8


def _mk_timer(f, x, *ws):
    import jax

    g = jax.jit(lambda v, *w: jax.lax.scan(
        lambda h, _: (f(h, *w), None), v, None, length=ITERS)[0])
    np.asarray(g(x, *ws))  # compile + warm

    def run():
        t0 = time.time()
        np.asarray(g(x, *ws))
        return (time.time() - t0) / ITERS

    return run


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.integers(0, 256, (K // 2, O)), jnp.uint8)
    scale = jnp.asarray(rng.standard_normal((K // 32, O)) * 0.01, jnp.bfloat16)
    minv = jnp.asarray(rng.standard_normal((K // 32, O)) * 0.01, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, K)) * 0.1, jnp.bfloat16)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)

    def specs(bo, bk, with_scale):
        in_specs = [
            pl.BlockSpec((B, K), lambda o, k: (0, 0)),
            pl.BlockSpec((bk // 2, bo), lambda o, k: (k, o)),
        ]
        if with_scale:
            in_specs.append(pl.BlockSpec((K // 32, bo), lambda o, k: (0, o)))
        return dict(
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(O // bo, K // bk),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((B, bo), lambda o, k: (0, o)),
                scratch_shapes=[pltpu.VMEM((B, bo), jnp.float32)],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

    def stream_kern(x_ref, qs_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += qs_ref[0:B, :].astype(jnp.int32).astype(jnp.float32)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def ws_kern(x_ref, qs_ref, scale_ref, o_ref, acc_ref, *, bk):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        k = pl.program_id(1)
        bkh = bk // 2
        Khalf = x_ref.shape[1] // 2
        nsub = bkh // 32
        To = o_ref.shape[1]
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

    def int8_kern(x_ref, qs_ref, o_ref, acc_ref, *, bk):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        k = pl.program_id(1)
        bkh = bk // 2
        Khalf = x_ref.shape[1] // 2
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

    def int8sub_kern(x_ref, qs_ref, scale_ref, o_ref, acc_ref, *, bk):
        """EXACT-math structure for the Q8-activation path: per-32-sub-block
        int8 dots, scale applied on the [B,To] accumulator (s[sub,o] *
        per-row activation scale folds in outside or per-sub — here s only,
        timing shape is identical)."""
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        k = pl.program_id(1)
        bkh = bk // 2
        Khalf = x_ref.shape[1] // 2
        nsub = bkh // 32
        q32 = qs_ref[...].astype(jnp.int32)
        lo = ((q32 & 0xF) - 8).astype(jnp.int8)
        hi = ((q32 >> 4) - 8).astype(jnp.int8)
        x1 = x_ref[:, pl.dslice(pl.multiple_of(k * bkh, 128), bkh)]
        x2 = x_ref[:, pl.dslice(pl.multiple_of(Khalf + k * bkh, 128), bkh)]
        s1 = scale_ref[pl.dslice(pl.multiple_of(k * nsub, 8), nsub), :].astype(jnp.float32)
        s2 = scale_ref[
            pl.dslice(pl.multiple_of((Khalf + k * bkh) // 32, 8), nsub), :
        ].astype(jnp.float32)
        acc = acc_ref[...]
        for i in range(nsub):
            p1 = jax.lax.dot_general(
                x1[:, 32 * i : 32 * i + 32], lo[32 * i : 32 * i + 32],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            p2 = jax.lax.dot_general(
                x2[:, 32 * i : 32 * i + 32], hi[32 * i : 32 * i + 32],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = acc + (p1.astype(jnp.float32) * s1[i][None, :]
                         + p2.astype(jnp.float32) * s2[i][None, :])
        acc_ref[...] = acc

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def int8sub_specs(bo, bk):
        return dict(
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(O // bo, K // bk),
                in_specs=[
                    pl.BlockSpec((B, K), lambda o, k: (0, 0)),
                    pl.BlockSpec((bk // 2, bo), lambda o, k: (k, o)),
                    pl.BlockSpec((K // 32, bo), lambda o, k: (0, o)),
                ],
                out_specs=pl.BlockSpec((B, bo), lambda o, k: (0, o)),
                scratch_shapes=[pltpu.VMEM((B, bo), jnp.float32)],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

    def int8_specs(bo, bk):
        return dict(
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(O // bo, K // bk),
                in_specs=[
                    pl.BlockSpec((B, K), lambda o, k: (0, 0)),
                    pl.BlockSpec((bk // 2, bo), lambda o, k: (k, o)),
                ],
                out_specs=pl.BlockSpec((B, bo), lambda o, k: (0, o)),
                scratch_shapes=[pltpu.VMEM((B, bo), jnp.int32)],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

    from mistralrs_tpu.ops.quant_matmul import _q4k_matmul_padded

    timers = {}

    for bo, bk in [(1024, 1024), (2048, 1024), (4096, 1024), (2048, 2048)]:
        def mk_stream(bo=bo, bk=bk):
            def f(xin, qs):
                y = pl.pallas_call(
                    stream_kern,
                    out_shape=jax.ShapeDtypeStruct((B, O), jnp.bfloat16),
                    **specs(bo, bk, False))(xin, qs)
                return xin + y[:, :K].astype(xin.dtype) * 0
            return f

        def mk_q4k(bo=bo, bk=bk):
            def f(xin, qs, scale, minv):
                y = _q4k_matmul_padded(xin, qs, scale, minv,
                                       block_o=bo, block_k=bk)
                return xin + y[:, :K] * 0
            return f

        try:
            timers[f"stream({bo},{bk})"] = _mk_timer(mk_stream(), x, qs)
        except Exception as e:
            print(f"stream({bo},{bk}): FAIL {str(e)[:90]}", flush=True)
        try:
            timers[f"q4k({bo},{bk})"] = _mk_timer(mk_q4k(), x, qs, scale, minv)
        except Exception as e:
            print(f"q4k({bo},{bk}): FAIL {str(e)[:90]}", flush=True)

    def mk_ws(bo, bk):
        def f(xin, qs, scale):
            y = pl.pallas_call(
                functools.partial(ws_kern, bk=bk),
                out_shape=jax.ShapeDtypeStruct((B, O), xin.dtype),
                **specs(bo, bk, True))(xin, qs, scale)
            return xin + y[:, :K] * 0
        return f

    for bo, bk in [(1024, 1024), (2048, 1024)]:
        try:
            timers[f"ws({bo},{bk})"] = _mk_timer(mk_ws(bo, bk), x, qs, scale)
        except Exception as e:
            print(f"ws({bo},{bk}): FAIL {str(e)[:90]}", flush=True)

    def mk_i8(bo, bk):
        def f(xin, qs):
            y = pl.pallas_call(
                functools.partial(int8_kern, bk=bk),
                out_shape=jax.ShapeDtypeStruct((B, O), jnp.int32),
                **int8_specs(bo, bk))(xin, qs)
            return xin + y[:, :K].astype(xin.dtype) * 0
        return f

    for bo, bk in [(1024, 1024), (2048, 1024)]:
        try:
            timers[f"int8({bo},{bk})"] = _mk_timer(mk_i8(bo, bk), xq, qs)
        except Exception as e:
            print(f"int8({bo},{bk}): FAIL {str(e)[:90]}", flush=True)

    def mk_i8sub(bo, bk):
        def f(xin, qs, scale):
            y = pl.pallas_call(
                functools.partial(int8sub_kern, bk=bk),
                out_shape=jax.ShapeDtypeStruct((B, O), jnp.bfloat16),
                **int8sub_specs(bo, bk))(xin, qs, scale)
            return xin + y[:, :K].astype(xin.dtype) * 0
        return f

    for bo, bk in [(1024, 1024), (2048, 1024), (4096, 1024)]:
        try:
            timers[f"int8sub({bo},{bk})"] = _mk_timer(mk_i8sub(bo, bk),
                                                      xq, qs, scale)
        except Exception as e:
            print(f"int8sub({bo},{bk}): FAIL {str(e)[:90]}", flush=True)

    # NOTE: * 1e-12 (not * 0): XLA DCEs `dot(x,w)*0` entirely — the earlier
    # "xla-bf16 at 950 GB/s" was an identity scan, not a matmul
    wbf = jax.jit(lambda: (jax.random.normal(
        jax.random.key(5), (K, O), jnp.bfloat16) * 0.02))()
    timers["xla-bf16"] = _mk_timer(
        lambda xin, w: xin + jnp.dot(xin, w)[:, :K] * 1e-12, x, wbf)

    # q6k at the bench layout
    import bench as driver_bench

    q6lin = driver_bench._random_q6k_linear(np.random.default_rng(1), K, O,
                                            jnp.bfloat16)
    from mistralrs_tpu.ops.quant_matmul import _q6k_matmul_padded

    G = q6lin.meta
    for bo in (2048, 4096):
        def mk_q6(bo=bo):
            def f(xin, ql, qh, sc):
                # r4: natural-order x — no runtime perm gather
                y = _q6k_matmul_padded(xin, ql, qh, sc, block_o=bo, G=G)
                return xin + y[:, :K] * 0
            return f

        try:
            timers[f"q6k(bo={bo})"] = _mk_timer(
                mk_q6(), x, q6lin.data["ql"], q6lin.data["qh"],
                q6lin.data["scale"])
        except Exception as e:
            print(f"q6k(bo={bo}): FAIL {str(e)[:90]}", flush=True)

    # interleaved repeats -> per-variant median
    results = {name: [] for name in timers}
    for _ in range(REPS):
        for name, run in timers.items():
            results[name].append(run())
    print(f"== medians over {REPS} interleaved reps, ITERS={ITERS} ==",
          flush=True)
    for name, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        gbs = (K // 2 * O) / med / 1e9
        print(f"{name:18s}: {med * 1e3:7.3f} ms  ({gbs:5.0f} GB/s vs qs bytes)",
              flush=True)




def q6k_int8_ab():
    """Time bf16 vs int8 Q6_K at the 7B ffn-down shape (gate for
    MISTRALRS_Q6K_INT8 default)."""
    import jax
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.ops.quant_matmul import (_q6k_matmul_padded,
                                                _q6k_q8_matmul_padded)

    Kd, Od = 14336, 4096
    lin = driver_bench._random_q6k_linear(np.random.default_rng(2), Kd, Od,
                                          jnp.bfloat16)
    G = lin.meta
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, Kd)) * 0.1, jnp.bfloat16)
    timers = {}

    def bf16(xin, ql, qh, sc):
        y = _q6k_matmul_padded(xin, ql, qh, sc, block_o=2048, G=G)
        # Od < Kd here: consume y via a tiny reduction (not *0 — XLA DCEs)
        return xin + y.sum().astype(xin.dtype) * 1e-20

    def i8(xin, ql, qh, sc):
        y = _q6k_q8_matmul_padded(xin, ql, qh, sc, block_o=2048, G=G)
        return xin + y.sum().astype(xin.dtype) * 1e-20

    for name, f in [("q6k-bf16", bf16), ("q6k-int8", i8)]:
        try:
            timers[name] = _mk_timer(f, x, lin.data["ql"], lin.data["qh"],
                                     lin.data["scale"])
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:120]}", flush=True)
    results = {n: [] for n in timers}
    for _ in range(REPS):
        for n, run in timers.items():
            results[n].append(run())
    for n, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        gbs = (Kd // 2 * Od + Kd // 4 * Od + Kd // 16 * Od * 2) / med / 1e9
        print(f"{n:10s}: {med * 1e3:7.3f} ms ({gbs:5.0f} GB/s packed)",
              flush=True)


def _run_pair(timers, bytes_packed):
    results = {n: [] for n in timers}
    for _ in range(REPS):
        for n, run in timers.items():
            results[n].append(run())
    for n, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{n:10s}: {med * 1e3:7.3f} ms ({bytes_packed / med / 1e9:5.0f}"
              f" GB/s packed)", flush=True)


def q8_0_int8_ab():
    """Time bf16 vs int8 Q8_0 at the 7B ffn-down shape (gate for
    MISTRALRS_Q8_0_INT8 default). Packed data is device-tiled (bench pools)."""
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.ops.quant_matmul import (_q8_0_matmul_padded,
                                                _q8_0_q8_matmul_padded)

    Kd, Od = 14336, 4096
    rng = np.random.default_rng(4)
    q = driver_bench._tiled(driver_bench._pool("qs", rng), (Kd, Od)).astype(jnp.int8)
    sc = driver_bench._tiled(driver_bench._pool("scale", rng),
                             (Kd // 32, Od), jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((B, Kd)) * 0.1,
                    jnp.bfloat16)
    timers = {}

    def bf16(xin, qq, ss):
        y = _q8_0_matmul_padded(xin, qq, ss, block_o=512, block_k=1024)
        return xin + y.sum().astype(xin.dtype) * 1e-20

    def i8(xin, qq, ss):
        y = _q8_0_q8_matmul_padded(xin, qq, ss, block_o=512, block_k=1024)
        return xin + y.sum().astype(xin.dtype) * 1e-20

    for name, f in [("q8_0-bf16", bf16), ("q8_0-int8", i8)]:
        try:
            timers[name] = _mk_timer(f, x, q, sc)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:120]}", flush=True)
    _run_pair(timers, Kd * Od + Kd // 32 * Od * 2)


def q5k_int8_ab():
    """Time bf16 vs int8 Q5_K at the 7B ffn-down shape (gate for
    MISTRALRS_Q5K_INT8 default)."""
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.ops.quant_matmul import (_q5k_matmul_padded,
                                                _q5k_q8_matmul_padded)

    Kd, Od = 14336, 4096
    rng = np.random.default_rng(6)
    qs = driver_bench._tiled(driver_bench._pool("qs", rng), (Kd // 2, Od))
    qh = driver_bench._tiled(driver_bench._pool("qs", rng), (Kd // 8, Od))
    sc = driver_bench._tiled(driver_bench._pool("scale", rng),
                             (Kd // 32, Od), jnp.bfloat16)
    mv = driver_bench._tiled(driver_bench._pool("minv", rng),
                             (Kd // 32, Od), jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((B, Kd)) * 0.1,
                    jnp.bfloat16)
    timers = {}

    def bf16(xin, a, b, c, d):
        y = _q5k_matmul_padded(xin, a, b, c, d, block_o=1024, block_k=1024,
                               block_k8=256)
        return xin + y.sum().astype(xin.dtype) * 1e-20

    def i8(xin, a, b, c, d):
        y = _q5k_q8_matmul_padded(xin, a, b, c, d, block_o=1024,
                                  block_k=1024, block_k8=256)
        return xin + y.sum().astype(xin.dtype) * 1e-20

    for name, f in [("q5k-bf16", bf16), ("q5k-int8", i8)]:
        try:
            timers[name] = _mk_timer(f, x, qs, qh, sc, mv)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:120]}", flush=True)
    _run_pair(timers, Kd // 2 * Od + Kd // 8 * Od + Kd // 32 * Od * 4)


if __name__ == "__main__":
    if "--q6k-int8" in sys.argv:
        q6k_int8_ab()
    elif "--q8_0-int8" in sys.argv:
        q8_0_int8_ab()
    elif "--q5k-int8" in sys.argv:
        q5k_int8_ab()
    else:
        main()
