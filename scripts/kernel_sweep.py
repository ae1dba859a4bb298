"""Block-size sweep for the round-2 fused dequant-GEMM kernels on hardware.

Round 1 swept only the Q4_K kernel (winner: 1024x1024, PERF.md). The Q5_K,
Q6_K and plane-affine (Q2_K/GPTQ/HQQ) kernels shipped with guessed tile
sizes — this times each at 7B decode shapes (B=8 padded GEMV) across a
(block_o, block_k) grid and prints the winner per kernel, plus the XLA
dequant reference as the floor check.

Run: python scripts/kernel_sweep.py  (expects the TPU tunnel up)
Apply winners as the new defaults in ops/quant_matmul.py + PERF.md note.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

ITERS = 50
K, O = 4096, 14336  # mistral-7b ffn shape (the fattest per-layer GEMM)


def _time(f, x) -> float:
    import jax

    def step(h, _):
        out = f(h)
        if out is None:  # kernel bowed out (shape constraints)
            raise ValueError("kernel fell back (returned None)")
        return out.sum().astype(h.dtype) * 0 + h, None

    g = jax.jit(lambda v: jax.lax.scan(step, v, None, length=ITERS)[0])
    np.asarray(g(x))
    t0 = time.time()
    np.asarray(g(x))
    return (time.time() - t0) / ITERS


def main():
    import jax.numpy as jnp

    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.ops import quant_matmul as qm
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.gguf_linear import linear_from_gguf

    rng = np.random.default_rng(1)
    w = (rng.standard_normal((O, K)) * 0.05).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((8, K)) * 0.3, jnp.bfloat16)

    cases = [
        ("q4k", GGMLType.Q4_K, qm.q4k_matmul, [(512, 512), (512, 1024),
                                               (1024, 1024), (1024, 2048),
                                               (2048, 1024)]),
        ("q5k", GGMLType.Q5_K, qm.q5k_matmul, [(256, 1024), (512, 512),
                                               (512, 1024), (512, 2048),
                                               (1024, 1024)]),
        ("q8_0", GGMLType.Q8_0, qm.q8_0_matmul, [(256, 1024), (512, 1024),
                                                 (512, 2048), (1024, 1024)]),
        ("q2k", GGMLType.Q2_K, None, [(256, 512), (512, 512), (512, 1024),
                                      (1024, 512)]),
    ]
    for name, gtype, fn, grid in cases:
        lin = linear_from_gguf(kquants.quantize(w, gtype), gtype, (O, K),
                               dtype=jnp.bfloat16)
        best = None
        for bo, bk in grid:
            try:
                if fn is not None:
                    dt = _time(lambda v: fn(lin, v, block_o=bo, block_k=bk), x)
                else:  # q2k rides the plane-affine kernel
                    dt = _time(lambda v: qm.affine_qmatmul(
                        lin, v, bits=2, group=16, zs_key="minv",
                        block_o=bo, block_k=bk), x)
                tag = f"{name} ({bo},{bk})"
                print(f"{tag:22s}: {dt * 1e3:7.3f} ms", flush=True)
                if best is None or dt < best[0]:
                    best = (dt, bo, bk)
            except Exception as e:
                print(f"{name} ({bo},{bk}): FAIL {type(e).__name__}: "
                      f"{str(e)[:80]}", flush=True)
        if best:
            print(f"--> {name} best: ({best[1]},{best[2]}) "
                  f"{best[0] * 1e3:.3f} ms", flush=True)

    # q6k has a single tunable (block_o); K tiling fixed by chunk layout
    lin6 = linear_from_gguf(kquants.quantize(w, GGMLType.Q6_K),
                            GGMLType.Q6_K, (O, K), dtype=jnp.bfloat16)
    for bo in (256, 512, 1024, 2048):
        try:
            dt = _time(lambda v: qm.q6k_matmul(lin6, v, block_o=bo), x)
            print(f"q6k block_o={bo:5d}    : {dt * 1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"q6k block_o={bo}: FAIL {type(e).__name__}: {str(e)[:80]}",
                  flush=True)


if __name__ == "__main__":
    main()
