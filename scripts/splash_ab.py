"""A/B the splash windowed/softcapped prefill vs masked dense sdpa on
hardware. Shapes: gemma2-9b-ish layer (Hq=16, Hkv=8, D=128) at chunk 512
with window 256 and softcap 50 — the case plain flash rejects and the
dense path materializes [B, Hq, T, T] scores for.

If splash wins (it should — O(T*block) memory + fused softcap), flip the
MISTRALRS_SPLASH default in models/decoder._use_splash_prefill and record
the delta in PERF.md.

Run: python scripts/splash_ab.py  (expects the TPU tunnel up)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

ITERS = 50


def _time_scan(f, x) -> float:
    import jax

    def step(h, _):
        return f(h), None

    g = jax.jit(lambda v: jax.lax.scan(step, v, None, length=ITERS)[0])
    np.asarray(g(x))
    t0 = time.time()
    np.asarray(g(x))
    return (time.time() - t0) / ITERS


def main():
    import jax.numpy as jnp

    from mistralrs_tpu.ops import attention as attn_ops
    from mistralrs_tpu.ops.splash import splash_prefill

    rng = np.random.default_rng(5)
    B, T, Hq, Hkv, D, W, CAP = 4, 512, 16, 8, 128, 256, 50.0
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    bias = attn_ops.causal_mask_bias(T, T, sliding_window=W)
    scale = D**-0.5

    dt_dense = _time_scan(
        lambda x: attn_ops.sdpa(x, k, v, scale=scale, mask=bias,
                                logits_softcap=CAP), q)
    print(f"dense masked sdpa : {dt_dense * 1e3:7.3f} ms/layer-chunk", flush=True)
    dt_splash = _time_scan(
        lambda x: splash_prefill(x, k, v, scale=scale, sliding_window=W,
                                 logits_softcap=CAP), q)
    print(f"splash kernel     : {dt_splash * 1e3:7.3f} ms/layer-chunk "
          f"({dt_dense / dt_splash:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
