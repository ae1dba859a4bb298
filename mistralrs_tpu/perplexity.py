"""Perplexity evaluation harness.

BASELINE.json's quality target is "perplexity within 0.05 of the reference
Q4_K"; the reference publishes no in-tree perplexity numbers, so this
harness produces ours (and the unquantized model's) for comparison:
sliding-window token-level PPL over a text file, llama.cpp-comparable.

Usage:
    python -m mistralrs_tpu.perplexity --model <hf-dir> [--isq Q4K] \
        --text wiki.test.raw --ctx 512 [--stride 512]
"""

from __future__ import annotations

import argparse
import math


def perplexity_over_tokens(cfg, params, rope, tokens, ctx: int = 512,
                           stride: int | None = None, dtype=None) -> float:
    """Token-level perplexity with a sliding window (only the non-overlapping
    tail of each window contributes loss, like the HF/llama.cpp recipe)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mistralrs_tpu.models.decoder import compute_logits, decoder_forward
    from mistralrs_tpu.ops.kv_cache import AttnMeta, KVCache

    stride = stride or ctx
    dtype = dtype or jnp.float32

    @jax.jit
    def window_nll(params, ids):
        B, T = ids.shape
        cache = KVCache.create(cfg.num_layers, B, T, cfg.num_kv_heads,
                               cfg.head_dim, dtype)
        meta = AttnMeta(
            positions=jnp.arange(T, dtype=jnp.int32)[None],
            kv_lens=jnp.asarray([T], jnp.int32),
            write_pos=jnp.zeros((B,), jnp.int32),
            active=jnp.ones((B,), jnp.float32),
        )
        h, _ = decoder_forward(params, cfg, rope, ids, cache, meta)
        logits = compute_logits(params, cfg, h)  # [B, T, V]
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]  # [B, T-1]
        return nll[0]

    tokens = list(tokens)
    total_nll, total_cnt = 0.0, 0
    pos = 0
    import numpy as np

    while pos + 1 < len(tokens):
        window = tokens[pos : pos + ctx]
        if len(window) < 2:
            break
        ids = np.zeros((1, ctx), np.int32)
        ids[0, : len(window)] = window
        nll = np.asarray(window_nll(params, ids))[: len(window) - 1]
        # only score the stride tail (avoid double-counting overlap)
        start = 0 if pos == 0 else ctx - stride - 1
        start = max(start, 0)
        total_nll += float(nll[start:].sum())
        total_cnt += int(nll[start:].shape[0])
        if pos + ctx >= len(tokens):
            break
        pos += stride
    return math.exp(total_nll / max(total_cnt, 1))


def main(argv=None):
    p = argparse.ArgumentParser("mistralrs-tpu-perplexity")
    p.add_argument("--model", required=True)
    p.add_argument("--isq", default=None)
    p.add_argument("--text", required=True)
    p.add_argument("--ctx", type=int, default=512)
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--max-tokens", type=int, default=None)
    args = p.parse_args(argv)

    from mistralrs_tpu.models.loader import load_hf_model
    from mistralrs_tpu.utils.tokenizer import TokenizerWrapper

    import jax.numpy as jnp

    cfg, params, rope = load_hf_model(args.model, dtype=jnp.float32, isq=args.isq)
    tok = TokenizerWrapper.from_hf_dir(args.model)
    with open(args.text) as f:
        tokens = tok.encode(f.read())
    if args.max_tokens:
        tokens = tokens[: args.max_tokens]
    ppl = perplexity_over_tokens(cfg, params, rope, tokens, ctx=args.ctx,
                                 stride=args.stride)
    print({"perplexity": round(ppl, 4), "tokens": len(tokens),
           "ctx": args.ctx, "isq": args.isq})


if __name__ == "__main__":
    main()
