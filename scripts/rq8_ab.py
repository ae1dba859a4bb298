"""A/B: Q6_K int8 kernel vs the q6k->rq8 requant fast lane (VERDICT r4 #2).

The r4 layer_decompose2 put Q6_K at ~343 GB/s vs Q4_K's 460; the kernel is
issue-bound (64 16-deep int8 dots + a two-plane unpack per k-step), not
DMA-bound. rq8 re-expresses w as int8 with a per-gs absmax scale (+21%
bytes at gs=64, ~4x below Q6_K's own quantization step) and serves through
the generalized Q8_0 int8 kernel: zero unpack, gs-deep dots.

Variants at the 7B ffn-down GEMV [14336 -> 4096], B=8, plus the lm_head
shape [4096 -> 32768]:
  q6k-int8           current serving route (block_o=2048)
  rq8-64(bo)         gs=64, block_o in {1024, 2048}
  rq8-32(bo)         gs=32 (wire-Q8_0-compatible), block_o in {1024, 2048}
  q8_0-int8-bo512    the r4 arm that measured 301 GB/s (regression check)

Run: python scripts/rq8_ab.py  (expects the TPU tunnel up)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

ITERS = 400
REPS = 3
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


def _shape_ab(Kd, Od, label):
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.ops.quant_matmul import (_q6k_q8_matmul_padded,
                                                _q8_0_q8_matmul_padded)
    from mistralrs_tpu.quant.gguf_linear import requant_q6k_to_q8

    lin = driver_bench._random_q6k_linear(np.random.default_rng(2), Kd, Od,
                                          jnp.bfloat16)
    G = lin.meta
    x = jnp.asarray(np.random.default_rng(3).standard_normal((B, Kd)) * 0.1,
                    jnp.bfloat16)
    timers, nbytes = {}, {}
    q6_bytes = Kd // 2 * Od + Kd // 4 * Od + Kd // 16 * Od * 2

    def q6(xin, ql, qh, sc):
        y = _q6k_q8_matmul_padded(xin, ql, qh, sc, block_o=min(2048, Od), G=G)
        return xin + y.sum().astype(xin.dtype) * 1e-20

    try:
        timers["q6k-int8"] = _mk_timer(q6, x, lin.data["ql"], lin.data["qh"],
                                       lin.data["scale"])
        nbytes["q6k-int8"] = q6_bytes
    except Exception as e:
        print(f"q6k-int8: FAIL {str(e)[:120]}", flush=True)

    for gs in (64, 32):
        rq = requant_q6k_to_q8(lin, gs=gs)
        q8b = Kd * Od + Kd // gs * Od * 4
        for bo in (1024, 2048):
            if Od % bo:
                continue

            def f(xin, qq, ss, gs=gs, bo=bo):
                y = _q8_0_q8_matmul_padded(xin, qq, ss, block_o=bo,
                                           block_k=1024, gs=gs)
                return xin + y.sum().astype(xin.dtype) * 1e-20

            name = f"rq8-{gs}(bo={bo})"
            try:
                timers[name] = _mk_timer(f, x, rq.data["q"], rq.data["scale"])
                nbytes[name] = q8b
            except Exception as e:
                print(f"{name}: FAIL {str(e)[:120]}", flush=True)

    # regression check: the r4 block_o=512 arm
    rq32 = requant_q6k_to_q8(lin, gs=32)

    def f512(xin, qq, ss):
        y = _q8_0_q8_matmul_padded(xin, qq, ss, block_o=512, block_k=1024,
                                   gs=32)
        return xin + y.sum().astype(xin.dtype) * 1e-20

    try:
        timers["rq8-32(bo=512)"] = _mk_timer(f512, x, rq32.data["q"],
                                             rq32.data["scale"])
        nbytes["rq8-32(bo=512)"] = Kd * Od + Kd // 32 * Od * 4
    except Exception as e:
        print(f"rq8-32(bo=512): FAIL {str(e)[:120]}", flush=True)

    results = {n: [] for n in timers}
    for _ in range(REPS):
        for n, run in timers.items():
            results[n].append(run())
    print(f"== {label} [{Kd} -> {Od}] B={B}, medians over {REPS} reps, "
          f"ITERS={ITERS} ==", flush=True)
    base = None
    for n, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        if n == "q6k-int8":
            base = med
        rate = nbytes[n] / med / 1e9
        rel = f"  {base/med:4.2f}x vs q6k" if base and n != "q6k-int8" else ""
        print(f"{n:16s}: {med*1e3:7.3f} ms ({rate:5.0f} GB/s packed){rel}",
              flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _shape_ab(14336, 4096, "ffn-down")
    _shape_ab(4096, 32768, "lm_head(padded)")


if __name__ == "__main__":
    main()
