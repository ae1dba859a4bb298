"""Quantization-distortion PPL table — every shipping format (VERDICT r4 #7).

The offline-measurable half of the BASELINE "PPL within 0.05 of mistral.rs
Q4_K" promise (the cross-implementation half needs cargo + real weights —
PARITY.md records that recipe). Here the TRAINED tiny model isolates the
quantizer's own damage: a 4-layer llama is fitted on CPU to an order-2
Markov stream until it is strongly predictive, then each ISQ format
(and GPTQ-4 RTN) is applied to the same checkpoint and PPL re-measured on
a held-out stream. A trained model is the right substrate — distortion on
random-init weights measures nothing (the logits carry no structure to
damage).

Run offline: JAX_PLATFORMS=cpu python scripts/ppl_distortion.py
"""
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# HID 256: k-quants pack 256-element superblocks along `in` — smaller
# widths silently fall back to dense and measure nothing
VOCAB, HID, LAYERS = 64, 256, 4
CTX, STRIDE = 128, 128


def _markov_stream(rng, n):
    """Order-1 Markov chain, 4 likely successors per state: learnable in
    hundreds of steps; held-out PPL floor ~= e^H(p) ~ 3.1, far below the
    64 uniform ceiling — so quantization damage to the learned transition
    structure is actually visible. The transition TABLE is fixed (one
    chain); `rng` only drives the sample path — train and held-out streams
    must come from the same process."""
    nxt = np.random.default_rng(42).integers(0, VOCAB, size=(VOCAB, 4))
    probs = np.array([0.55, 0.25, 0.15, 0.05])
    out = [1]
    for _ in range(n - 1):
        out.append(int(nxt[out[-1], rng.choice(4, p=probs)]))
    return out


def _train_tiny(ckpt_dir, steps=1200):
    import torch
    import transformers as tf

    torch.manual_seed(0)
    torch.set_num_threads(1)
    hf_cfg = tf.LlamaConfig(
        hidden_size=HID, intermediate_size=2 * HID, num_hidden_layers=LAYERS,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=VOCAB,
        max_position_embeddings=512,
    )
    model = tf.LlamaForCausalLM(hf_cfg).train().float()
    opt = torch.optim.AdamW(model.parameters(), lr=3e-3)
    rng = np.random.default_rng(7)
    stream = _markov_stream(rng, 140_000)
    data = torch.tensor(stream, dtype=torch.long)
    B, S = 16, 64
    t0 = time.time()
    for step in range(steps):
        idx = torch.randint(0, len(stream) - S - 1, (B,))
        ids = torch.stack([data[i : i + S + 1] for i in idx])
        # labels == input ids: HF CausalLM shifts internally
        out = model(ids, labels=ids)
        opt.zero_grad()
        out.loss.backward()
        opt.step()
        if step % 100 == 0 or step == steps - 1:
            print(f"  train step {step}: loss {out.loss.item():.3f} "
                  f"(ppl {np.exp(out.loss.item()):.1f}, "
                  f"{time.time()-t0:.0f}s)", flush=True)
    model.eval().save_pretrained(ckpt_dir, safe_serialization=True)
    return _markov_stream(np.random.default_rng(1234), 2048)  # held-out


def _to_gptq(params, bits=4, group=32):
    """Dense stacked Linears -> GPTQ-RTN stacked Linears (same leaf
    structure trick as TextPipeline.re_isq, but format-targeted)."""
    import jax
    import jax.numpy as jnp

    from mistralrs_tpu.quant.gptq import gptq_linear_from_tensors, quantize_gptq_rtn
    from mistralrs_tpu.quant.qlinear import Linear

    is_lin = lambda x: isinstance(x, Linear)  # noqa: E731

    def conv_one(w_in_out, b):
        t = quantize_gptq_rtn(np.asarray(w_in_out, np.float32).T, bits, group)
        return gptq_linear_from_tensors(
            t["qweight"], t["qzeros"], t["scales"], t.get("g_idx"), bits,
            w_in_out.shape[0], w_in_out.shape[1], dtype=jnp.float32,
            bias=None if b is None else np.asarray(b, np.float32))

    def conv(leaf):
        if not is_lin(leaf) or leaf.kind != "dense":
            return leaf
        w = leaf.data["w"]
        b = leaf.data.get("b")
        if w.ndim == 2:  # unstacked (lm_head)
            return conv_one(w, b)
        ls = [conv_one(w[i], None if b is None else b[i])
              for i in range(w.shape[0])]
        return Linear(kind=ls[0].kind, shape=ls[0].shape,
                      data={k: jnp.stack([l.data[k] for l in ls])
                            for k in ls[0].data},
                      meta=ls[0].meta)

    import dataclasses

    groups = [jax.tree.map(conv, g, is_leaf=is_lin)
              for g in params.layer_groups]
    lm = conv(params.lm_head) if params.lm_head is not None else None
    return dataclasses.replace(params, layer_groups=groups, lm_head=lm)


def main():
    import jax.numpy as jnp

    from mistralrs_tpu.models.loader import load_hf_model
    from mistralrs_tpu.perplexity import perplexity_over_tokens

    ckpt = os.path.join(tempfile.gettempdir(), "ppl_distortion_ckpt")
    if os.path.exists(os.path.join(ckpt, "model.safetensors")):
        held = _markov_stream(np.random.default_rng(1234), 2048)
        print(f"(reusing trained checkpoint {ckpt})", flush=True)
    else:
        held = _train_tiny(ckpt)

    cfg, params, rope = load_hf_model(ckpt, dtype=jnp.float32)
    base = perplexity_over_tokens(cfg, params, rope, held, ctx=CTX, stride=STRIDE)
    print(f"\nf32 baseline PPL: {base:.4f}  (uniform={VOCAB})", flush=True)
    rows = []
    for fmt in ("Q8_0", "Q6_K", "Q5_K", "Q4_K", "Q3_K", "Q2_K",
                "HQQ8", "HQQ4"):
        t0 = time.time()
        c, p, r = load_hf_model(ckpt, dtype=jnp.float32, isq=fmt)
        ppl = perplexity_over_tokens(c, p, r, held, ctx=CTX, stride=STRIDE)
        rows.append((fmt, ppl))
        print(f"{fmt:6s}: PPL {ppl:.4f}  d={ppl-base:+.4f} "
              f"({100*(ppl-base)/base:+.2f}%)  ({time.time()-t0:.0f}s)",
              flush=True)
    # q6k -> rq8 requant (the r5 serving fast lane): distortion ON TOP of
    # Q6_K must be negligible (~4x below Q6_K's own step)
    from mistralrs_tpu.quant.fuse import requant_q6k_params

    c6, p6, r6 = load_hf_model(ckpt, dtype=jnp.float32, isq="Q6_K")
    for gs in (64, 32):
        t0 = time.time()
        ppl = perplexity_over_tokens(c6, requant_q6k_params(p6, gs=gs), r6,
                                     held, ctx=CTX, stride=STRIDE)
        rows.append((f"Q6K-rq8-{gs}", ppl))
        print(f"Q6K-rq8-{gs}: PPL {ppl:.4f}  d={ppl-base:+.4f} "
              f"({100*(ppl-base)/base:+.2f}%)  ({time.time()-t0:.0f}s)",
              flush=True)

    t0 = time.time()
    gp = _to_gptq(params, bits=4, group=32)
    ppl = perplexity_over_tokens(cfg, gp, rope, held, ctx=CTX, stride=STRIDE)
    rows.append(("GPTQ4-RTN", ppl))
    print(f"GPTQ4 : PPL {ppl:.4f}  d={ppl-base:+.4f} "
          f"({100*(ppl-base)/base:+.2f}%)  ({time.time()-t0:.0f}s)", flush=True)

    print("\n| format | PPL | delta vs f32 | delta % |")
    print("|---|---|---|---|")
    print(f"| f32 | {base:.4f} | — | — |")
    for fmt, ppl in rows:
        print(f"| {fmt} | {ppl:.4f} | {ppl-base:+.4f} | "
              f"{100*(ppl-base)/base:+.2f}% |")


if __name__ == "__main__":
    main()
