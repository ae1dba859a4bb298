"""B-crossover A/B (VERDICT r4 #3): int8 kernels' accumulator ops scale
B*To*(K/gs) while the bf16 kernels' weight-side scaling is B-independent —
find the n_rows crossover per format at the 7B ffn-down shape and set the
dispatch thresholds from data.

Arms per B in {8, 16, 32, 48, 64}:
  q4k-int8 / q4k-bf16
  rq8-64-int8 / xla-ref (dequant + dot — the bf16 route for rq8)
  q6k-int8 / q6k-bf16 (threshold currently n_rows<=16; re-check vs rq8)

Run: python scripts/crossover_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

ITERS = 200
REPS = 3
K, O = 14336, 4096


def _mk_timer(f, x, *ws):
    import jax

    g = jax.jit(lambda v, *w: jax.lax.scan(
        lambda h, _: (f(h, *w), None), v, None, length=ITERS)[0])
    np.asarray(g(x, *ws))

    def run():
        t0 = time.time()
        np.asarray(g(x, *ws))
        return (time.time() - t0) / ITERS

    return run


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import bench as driver_bench
    from mistralrs_tpu.ops.quant_matmul import (
        _q4k_matmul_padded,
        _q4k_q8_matmul_padded,
        _q6k_matmul_padded,
        _q6k_q8_matmul_padded,
        _q8_0_q8_matmul_padded,
    )
    from mistralrs_tpu.quant.gguf_linear import (
        dequant_q8_0_gs_weights,
        requant_q6k_to_q8,
    )

    rng = np.random.default_rng(0)
    q4 = driver_bench._random_q4k_linear(rng, K, O, jnp.bfloat16)
    q6 = driver_bench._random_q6k_linear(rng, K, O, jnp.bfloat16)
    rq = requant_q6k_to_q8(q6, gs=64)
    G = q6.meta

    def feed(y, xin):
        return xin + y.sum().astype(xin.dtype) * 1e-20

    for B in (8, 16, 32, 48, 64):
        x = jnp.asarray(np.random.default_rng(B).standard_normal((B, K)) * 0.1,
                        jnp.bfloat16)
        arms = {}
        arms["q4k-int8"] = (lambda xin, a, b, c: feed(
            _q4k_q8_matmul_padded(xin, a, b, c, block_o=1024, block_k=1024),
            xin), (q4.data["qs"], q4.data["scale"], q4.data["minv"]))
        arms["q4k-bf16"] = (lambda xin, a, b, c: feed(
            _q4k_matmul_padded(xin, a, b, c, block_o=1024, block_k=1024),
            xin), (q4.data["qs"], q4.data["scale"], q4.data["minv"]))
        arms["q6k-int8"] = (lambda xin, a, b, c: feed(
            _q6k_q8_matmul_padded(xin, a, b, c, block_o=2048, G=G), xin),
            (q6.data["ql"], q6.data["qh"], q6.data["scale"]))
        arms["q6k-bf16"] = (lambda xin, a, b, c: feed(
            _q6k_matmul_padded(xin, a, b, c, block_o=2048, G=G), xin),
            (q6.data["ql"], q6.data["qh"], q6.data["scale"]))
        arms["rq8-int8"] = (lambda xin, a, b: feed(
            _q8_0_q8_matmul_padded(xin, a, b, block_o=1024, block_k=1024,
                                   gs=64), xin),
            (rq.data["q"], rq.data["scale"]))

        def rq_ref(xin, a, b):
            import dataclasses as _dc
            lin = _dc.replace(rq, data={"q": a, "scale": b})
            w = dequant_q8_0_gs_weights(lin, xin.dtype)
            return feed(jnp.dot(xin, w.T), xin)

        arms["rq8-xla"] = (rq_ref, (rq.data["q"], rq.data["scale"]))

        timers = {}
        for name, (f, ws) in arms.items():
            try:
                timers[name] = _mk_timer(f, x, *ws)
            except Exception as e:
                print(f"B={B} {name}: FAIL {str(e)[:100]}", flush=True)
        results = {n: [] for n in timers}
        for _ in range(REPS):
            for n, run in timers.items():
                results[n].append(run())
        line = f"B={B:3d}: " + "  ".join(
            f"{n}={sorted(ts)[len(ts)//2]*1e3:6.3f}ms"
            for n, ts in results.items())
        print(line, flush=True)


if __name__ == "__main__":
    main()
