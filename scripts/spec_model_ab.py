"""Model-draft speculative decoding on the chip (VERDICT r4 #1, the
model-draft half; BASELINE config 5's shape with a smaller-layer draft).

Draft = the FIRST 8 LAYERS of the target (the per-layer Linear arrays are
shared — zero extra weight HBM; its own KV cache), run through the
on-device spec loop (SpeculativePipeline.run_spec_multi: draft steps +
verify + rewinds in one scan).

Acceptance is checkpoint-dependent, so it is swept explicitly: the
target's layers 8..31 have their residual contributions (attn.o and
mlp.down outputs) scaled by eps — exact on the affine packed formats
(scale/minv *= eps). eps=0 makes the target compute exactly what the
8-layer draft computes (acceptance ~1.0, modulo bf16 argmax ties);
eps=1 is the unmodified random target (acceptance ~0 — independent
random weights agree on nothing); eps in between sweeps the curve. Each
arm reports tok/s + MEASURED acceptance; the plain ds=64 baseline rides
along for the same windows.

Run: python scripts/spec_model_ab.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

DRAFT_LAYERS = 8
MAXLEN = 64


def _scale_tail(params, eps):
    """Scale layers >= DRAFT_LAYERS' o/down outputs by eps (exact on the
    packed affine formats: w = q*scale [- minv] -> scale/minv *= eps)."""
    import jax
    import jax.numpy as jnp

    from mistralrs_tpu.quant.qlinear import Linear

    is_lin = lambda x: isinstance(x, Linear)  # noqa: E731

    def scale_lin(lin, row_mask):
        # row_mask [L] 1.0 where the layer keeps full scale, eps where damped
        def f(k, v):
            if k in ("scale", "minv"):
                m = row_mask.reshape((-1,) + (1,) * (v.ndim - 1)).astype(v.dtype)
                return v * m
            return v

        return Linear(kind=lin.kind, shape=lin.shape,
                      data={k: f(k, v) for k, v in lin.data.items()},
                      meta=lin.meta)

    new_groups = []
    off = 0
    for g, size in zip(params.layer_groups, params.group_sizes):
        idx = np.arange(off, off + size)
        mask = jnp.asarray(np.where(idx >= DRAFT_LAYERS, eps, 1.0), jnp.float32)

        def conv(leaf, path_is_proj=[False]):
            return leaf

        # walk attn.o and mlp.down explicitly
        g2 = {k: v for k, v in g.items()}
        g2["attn"] = {k: (scale_lin(v, mask) if k == "o" and is_lin(v) else v)
                      for k, v in g["attn"].items()}
        g2["mlp"] = {k: (scale_lin(v, mask) if k == "down" and is_lin(v) else v)
                     for k, v in g["mlp"].items()}
        new_groups.append(g2)
        off += size
    return dataclasses.replace(params, layer_groups=new_groups)


def _prefix_params(params, n):
    """First n layers as their own DecoderParams; embed/norm/lm_head and
    the per-layer arrays are SHARED (slices of stacked groups)."""
    import jax

    from mistralrs_tpu.quant.qlinear import Linear

    is_lin = lambda x: isinstance(x, Linear)  # noqa: E731
    groups, sizes = [], []
    off = 0
    for g, size in zip(params.layer_groups, params.group_sizes):
        if off >= n:
            break
        take = min(size, n - off)

        def cut(x, take=take):
            if is_lin(x):
                return Linear(kind=x.kind, shape=x.shape,
                              data={k: v[:take] for k, v in x.data.items()},
                              meta=x.meta)
            return x[:take]

        groups.append(jax.tree.map(cut, g, is_leaf=is_lin) if take < size else g)
        sizes.append(take)
        off += size
    return dataclasses.replace(params, layer_groups=groups,
                               group_sizes=tuple(sizes))


def _neg_head(params):
    """Adversarial draft: negate the draft lm_head's scales (exact -w on the
    packed format), so the draft proposes ~argmin of the target's logit
    direction — measured acceptance pins the acc~0 FLOOR of the speculative
    tok/s(acceptance) curve (the eps tail-damping sweep could not pull
    acceptance below 1.0: shared embed/lm_head dominate the argmax)."""
    from mistralrs_tpu.quant.qlinear import Linear

    lm = params.lm_head
    data = {k: (-v if k == "scale" else v) for k, v in lm.data.items()}
    return dataclasses.replace(
        params, lm_head=Linear(kind=lm.kind, shape=lm.shape, data=data,
                               meta=lm.meta))


def _arm(eps, gamma, rounds, reps=3, adversarial=False):
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.speculative import SpeculativePipeline
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
    tparams = _scale_tail(params, eps) if eps != 1.0 else params
    dcfg = dataclasses.replace(cfg, num_layers=DRAFT_LAYERS)
    dparams = _prefix_params(params, DRAFT_LAYERS)
    if adversarial:
        dparams = _neg_head(dparams)
    rope = make_rope(cfg, 2048)
    pc = PipelineConfig(page_size=16, num_pages=256, max_seqs=2,
                        max_model_len=2048, prefill_buckets=(64,))
    spec = SpeculativePipeline(
        TextPipeline(cfg, tparams, rope, pc),
        TextPipeline(dcfg, dparams, rope, pc),
        gamma=gamma, spec_rounds=rounds)
    eng = Engine(spec, eos_token_ids=set(), prefix_cache=False)
    prompt = list(np.random.default_rng(1).integers(1, 30000, size=64))
    eng.generate(prompt, SamplingParams(max_len=8))  # compile
    rates, prop, acc = [], 0, 0
    for _ in range(reps):
        g = eng.add_request(GenerationRequest(
            list(prompt), SamplingParams(max_len=MAXLEN)))
        rates.append(driver_bench._decode_rate(eng, [g]))
        for s in g.seqs:
            prop += s.spec_proposed
            acc += s.spec_accepted
    del eng, spec
    return sorted(rates)[len(rates) // 2], (acc / prop if prop else 0.0)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "adversarial" in sys.argv[1:]:
        for gamma, rounds in ((4, 13),):
            t0 = time.time()
            try:
                r, a = _arm(1.0, gamma, rounds, reps=2, adversarial=True)
                print(f"mdraft ADV g={gamma} R={rounds}: {r:7.2f} tok/s"
                      f"  acc={a:.2f} ({time.time()-t0:.0f}s)", flush=True)
            except Exception as e:
                import traceback

                print(f"mdraft ADV g={gamma}: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
                traceback.print_exc()
        return
    for eps in (0.0, 0.3, 1.0):
        for gamma, rounds in ((4, 13), (3, 16)):
            t0 = time.time()
            try:
                r, a = _arm(eps, gamma, rounds)
                print(f"mdraft eps={eps} g={gamma} R={rounds}: {r:7.2f} tok/s"
                      f"  acc={a:.2f} ({time.time()-t0:.0f}s)", flush=True)
            except Exception as e:
                import traceback

                print(f"mdraft eps={eps} g={gamma}: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
                traceback.print_exc()
                return


if __name__ == "__main__":
    main()
