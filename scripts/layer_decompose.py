"""Per-matmul decode-step decomposition at the real 7B layer shapes (r3).

step_decompose measured 0.730 ms/tok/layer through the engine with the
int8 paths ON, but the standalone kernel A/Bs predict only ~0.27 ms of
weights-path per layer — this times each layer matmul EXACTLY as the
engine calls it (same padded shapes, same dispatch wrappers, B=1 padded
to 8 rows, bf16 activations) to locate the other ~0.46 ms.

Run: python scripts/layer_decompose.py  (TPU tunnel up)
"""
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

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as driver_bench
    from mistralrs_tpu.ops.quant_matmul import q4k_matmul, q6k_matmul

    rng = np.random.default_rng(0)
    H, D, I = 4096, 128, 14336
    # the engine's fused-projection shapes for the Q4_K_M mix:
    # q+k fuse (both Q4_K) -> [H, 40*D]? no: q 32 heads + k 8 kv heads only
    # fuse when kinds match AND fuse_linears groups them — the pipeline fuses
    # [q,k,v] together or not at all; v is Q6_K so qkv stays UNFUSED, and
    # gate+up (both Q4_K) fuse. Shapes below mirror that.
    mats = {
        "q   4096x4096 q4k": driver_bench._random_q4k_linear(rng, H, 32 * D, jnp.bfloat16),
        "k   4096x1024 q4k": driver_bench._random_q4k_linear(rng, H, 8 * D, jnp.bfloat16),
        "v   4096x1024 q6k": driver_bench._random_q6k_linear(rng, H, 8 * D, jnp.bfloat16),
        "o   4096x4096 q4k": driver_bench._random_q4k_linear(rng, 32 * D, H, jnp.bfloat16),
        "g+u 4096x28672 q4k": driver_bench._random_q4k_linear(rng, H, 2 * I, jnp.bfloat16),
        "dn  14336x4096 q4k": driver_bench._random_q4k_linear(rng, I, H, jnp.bfloat16),
        "dn6 14336x4096 q6k": driver_bench._random_q6k_linear(rng, I, H, jnp.bfloat16),
        "lmh 4096x32000 q6k": driver_bench._random_q6k_linear(rng, H, 32000, jnp.bfloat16),
    }

    def timer(lin, B=1):
        mm = q6k_matmul if lin.kind == "gguf_q6k" else q4k_matmul
        K = lin.shape[0]

        def f(xin):
            y = mm(lin, xin)
            return xin + y.sum().astype(xin.dtype) * 1e-20

        x0 = jnp.asarray(rng.standard_normal((B, K)) * 0.1, jnp.bfloat16)
        g = jax.jit(lambda v: jax.lax.scan(
            lambda h, _: (f(h), None), v, None, length=ITERS)[0])
        np.asarray(g(x0))  # compile

        def run():
            t0 = time.time()
            np.asarray(g(x0))
            return (time.time() - t0) / ITERS

        return run

    for name, lin in mats.items():
        try:
            r = timer(lin)
            ts = sorted(r() for _ in range(REPS))
            med = ts[len(ts) // 2]
            print(f"{name:20s}: {med * 1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"{name:20s}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
