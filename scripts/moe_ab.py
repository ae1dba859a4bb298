"""A/B/C the MoE dispatch backends on hardware (VERDICT r1 next-step #4).

Times, at Mixtral-8x7B expert shapes (H=4096, I=14336, E=8, K=2):
  dense  — every expert computes every token (current TPU fallback,
           pipeline/text.py moe_grouped gate; E/K = 4x wasted FLOPs)
  ragged — lax.ragged_dot grouped GEMMs (exact; Mosaic lowering unverified
           until test_ragged_dot_moe_on_chip passes on this toolchain)
  gmm    — Pallas megablocks kernel (ops/grouped_gemm.py)

for decode (batch 16 -> 32 pairs) and prefill (512 tokens -> 1024 pairs).
Timing per the axon rules (PERF.md): 20-iter chained lax.scan with one
final np.asarray fetch; block_until_ready is a no-op on this backend.

Run: python scripts/moe_ab.py  (expects the TPU tunnel up)
If ragged/gmm lower and win, flip the TPU gate in pipeline/text.py:96-109
and record numbers in PERF.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

H, I, E, K = 4096, 14336, 8, 2
ITERS = 20


def _time(fn, *args) -> float:
    """fn(x, *weights) -> x'; weights passed as ARGS (a closed-over device
    array becomes a jit CONSTANT and the axon AOT compile ships all ~3 GB
    of expert weights through the tunnel — the r3 queue run timed out on
    exactly that)."""
    import jax

    def step(h, ws, _):
        return fn(h, *ws), None

    f = jax.jit(lambda x, *ws: jax.lax.scan(
        lambda h, _: step(h, ws, _), x, None, length=ITERS)[0])
    np.asarray(f(*args))  # compile + warm
    t0 = time.time()
    np.asarray(f(*args))
    return (time.time() - t0) / ITERS


def _weights(dtype):
    # generate ON DEVICE: ~11 GB of host-side standard_normal took minutes
    # on this 1-core host (the r2 queue run timed out before printing)
    import jax

    ks = jax.random.split(jax.random.key(0), 3)
    wg = jax.random.normal(ks[0], (E, H, I), dtype) * 0.02
    wu = jax.random.normal(ks[1], (E, H, I), dtype) * 0.02
    wd = jax.random.normal(ks[2], (E, I, H), dtype) * 0.02
    return wg, wu, wd


def main():
    import jax
    import jax.numpy as jnp

    from mistralrs_tpu.ops.grouped_gemm import grouped_matmul

    rng = np.random.default_rng(3)
    wg, wu, wd = _weights(jnp.bfloat16)

    for name, n_tok in [("decode b=16", 16), ("prefill 512", 512)]:
        x = jnp.asarray(rng.standard_normal((n_tok, H)) * 0.1, jnp.bfloat16)
        router = jnp.asarray(rng.standard_normal((H, E)) * 0.1, jnp.bfloat16)

        def route(xt, router):
            logits = (xt @ router).astype(jnp.float32)
            topw, topi = jax.lax.top_k(logits, K)
            return jax.nn.softmax(topw, axis=-1), topi

        def dense(xt, wg, wu, wd, router):
            topw, topi = route(xt, router)
            mask = jax.nn.one_hot(topi, E, dtype=xt.dtype)  # [N, K, E]
            w_tok = (topw.astype(xt.dtype)[..., None] * mask).sum(1)  # [N, E]
            g = jnp.einsum("nh,ehi->nei", xt, wg)
            u = jnp.einsum("nh,ehi->nei", xt, wu)
            d = jnp.einsum("nei,eih->neh", jax.nn.silu(g) * u, wd)
            return (d * w_tok[..., None]).sum(1).astype(xt.dtype)

        def grouped(xt, wg, wu, wd, router, backend):
            topw, topi = route(xt, router)
            n = xt.shape[0]
            eid = topi.reshape(-1)
            order = jnp.argsort(eid, stable=True)
            tok = (jnp.arange(n * K) // K)[order]
            gath = jnp.take(xt, tok, axis=0)
            gs = jnp.bincount(eid, length=E).astype(jnp.int32)
            g = grouped_matmul(gath, wg, gs, backend=backend)
            u = grouped_matmul(gath, wu, gs, backend=backend)
            d = grouped_matmul(jax.nn.silu(g) * u, wd, gs, backend=backend)
            wp = topw.reshape(-1)[order].astype(d.dtype)
            return jnp.zeros((n, H), d.dtype).at[tok].add(d * wp[:, None]).astype(xt.dtype)

        results = {}
        for label, body in [
            ("dense", dense),
            ("ragged", lambda xt, *ws: grouped(xt, *ws, backend="ragged")),
            ("gmm", lambda xt, *ws: grouped(xt, *ws, backend="gmm")),
        ]:
            try:
                results[label] = _time(body, x, wg, wu, wd, router)
            except Exception as e:  # Mosaic lowering failures land here
                results[label] = None
                print(f"{name} {label:6s}: FAILED {type(e).__name__}: {e}", flush=True)
        for label, dt in results.items():
            if dt is not None:
                print(f"{name} {label:6s}: {dt * 1e3:7.3f} ms/layer-step", flush=True)


if __name__ == "__main__":
    main()
