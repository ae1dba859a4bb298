"""Isolate the per-call GEMV fixed cost: raw padded kernels (pre-padded,
pre-permuted, B=8) vs the dispatcher wrappers (pad + act-quant + perm
gather + min-term). r3 follow-up to layer_decompose.py."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

ITERS = 400
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mistralrs_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as driver_bench
    from mistralrs_tpu.ops.quant_matmul import (
        _q4k_matmul_padded, _q4k_q8_matmul_padded, _q6k_matmul_padded,
        _q6k_q8_matmul_padded, _quantize_acts_q8)

    rng = np.random.default_rng(0)

    def scan_timer(f, *args):
        g = jax.jit(lambda v, *w: jax.lax.scan(
            lambda h, _: (f(h, *w), None), v, None, length=ITERS)[0])
        np.asarray(g(*args))

        def run():
            t0 = time.time()
            np.asarray(g(*args))
            return (time.time() - t0) / ITERS
        ts = sorted(run() for _ in range(REPS))
        return ts[len(ts) // 2]

    # raw q4k int8 padded calls at the Q4_K shapes, B=8 (decode) and B=32
    # (the b32 step_decompose slope is 1.167 vs 0.504 ms/layer at B=1 —
    # locate how much of the 0.66 ms/layer B-scaled cost is kernel-side
    # accumulator/VPU work vs engine machinery)
    for B in (8, 32):
        for name, (K, O) in [("q-raw  4096x4096", (4096, 4096)),
                             ("k-raw  4096x1024", (4096, 1024)),
                             ("gu-raw 4096x28672", (4096, 28672)),
                             ("dn-raw 14336x4096", (14336, 4096))]:
            lin = driver_bench._random_q4k_linear(rng, K, O, jnp.bfloat16)
            x = jnp.asarray(rng.standard_normal((B, K)) * 0.1, jnp.bfloat16)

            def f(xin, qs, sc, mv):
                y = _q4k_q8_matmul_padded(xin, qs, sc, mv, block_o=1024,
                                          block_k=1024)
                return xin + y.sum().astype(xin.dtype) * 1e-20

            med = scan_timer(f, x, lin.data["qs"], lin.data["scale"],
                             lin.data["minv"])
            print(f"B={B:2d} {name:20s}: {med * 1e3:7.3f} ms", flush=True)

    # bf16-unpack kernels at B=32: the int8 paths' accumulator-side scale
    # ops cost B*To*(K/32) while the bf16 kernels' weight-side scaling is
    # B-independent — crossover ~B=32 (b32 slope 1.167 vs 0.504 ms/layer).
    # If bf16 wins at B=32, the dispatcher gets an n_rows threshold.
    for B in (8, 32):
        for name, (K, O) in [("gu-bf16 4096x28672", (4096, 28672)),
                             ("dn-bf16 14336x4096", (14336, 4096))]:
            lin = driver_bench._random_q4k_linear(rng, K, O, jnp.bfloat16)
            x = jnp.asarray(rng.standard_normal((B, K)) * 0.1, jnp.bfloat16)

            def fb(xin, qs, sc, mv):
                y = _q4k_matmul_padded(xin, qs, sc, mv, block_o=1024,
                                       block_k=1024)
                return xin + y.sum().astype(xin.dtype) * 1e-20

            med = scan_timer(fb, x, lin.data["qs"], lin.data["scale"],
                             lin.data["minv"])
            print(f"B={B:2d} {name:20s}: {med * 1e3:7.3f} ms", flush=True)
        lin6 = driver_bench._random_q6k_linear(rng, 14336, 4096, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((B, 14336)) * 0.1, jnp.bfloat16)

        def f6b(xin, ql, qh, sc):
            y = _q6k_matmul_padded(xin, ql, qh, sc, block_o=2048,
                                   G=lin6.meta)
            return xin + y.sum().astype(xin.dtype) * 1e-20

        def f6i(xin, ql, qh, sc):
            y = _q6k_q8_matmul_padded(xin, ql, qh, sc, block_o=2048,
                                      G=lin6.meta)
            return xin + y.sum().astype(xin.dtype) * 1e-20

        m_b = scan_timer(f6b, x, lin6.data["ql"], lin6.data["qh"],
                         lin6.data["scale"])
        m_i = scan_timer(f6i, x, lin6.data["ql"], lin6.data["qh"],
                         lin6.data["scale"])
        print(f"B={B:2d} dn6 bf16 vs int8   : {m_b * 1e3:7.3f} | "
              f"{m_i * 1e3:7.3f} ms", flush=True)

    # q6k int8 natural-order path (r4: the runtime perm gather is gone)
    for name, (K, O) in [("v6-raw 4096x1024", (4096, 1024)),
                         ("dn6-raw 14336x4096", (14336, 4096))]:
        lin = driver_bench._random_q6k_linear(rng, K, O, jnp.bfloat16)
        G = lin.meta
        x = jnp.asarray(rng.standard_normal((8, K)) * 0.1, jnp.bfloat16)

        def f_nat(xin, ql, qh, sc):
            y = _q6k_q8_matmul_padded(xin, ql, qh, sc, block_o=2048, G=G)
            return xin + y.sum().astype(xin.dtype) * 1e-20

        m1 = scan_timer(f_nat, x, lin.data["ql"], lin.data["qh"], lin.data["scale"])
        print(f"{name:20s}: {m1 * 1e3:7.3f} ms natural-order", flush=True)

    # the act-quant chain alone at [8, 4096]
    x = jnp.asarray(rng.standard_normal((8, 4096)) * 0.1, jnp.bfloat16)

    def f_q(xin):
        xq, xs = _quantize_acts_q8(xin)
        return xin + (xq.sum().astype(xin.dtype) + xs.sum().astype(xin.dtype)) * 1e-20

    print(f"{'actquant [8,4096]':20s}: {scan_timer(f_q, x) * 1e3:7.3f} ms",
          flush=True)

    # empty scan floor
    print(f"{'scan floor':20s}: "
          f"{scan_timer(lambda xin: xin * 1.0000001, x) * 1e3:7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
