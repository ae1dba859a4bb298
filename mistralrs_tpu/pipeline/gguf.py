"""GGUF model pipeline: quantized checkpoint -> runnable model.

Reference parity: mistralrs-core/src/pipeline/gguf.rs (GGUFPipeline/Loader)
+ models/quantized_llama.rs `ModelWeights::from_gguf` (:397) — the GGUF
"llama" architecture serves Llama/Mistral(/Mixtral) files. Metadata keys ->
ModelConfig; weight tensors stay packed (quant/gguf_linear device formats);
norms/embeddings are dequantized (embeddings must be gatherable).

Multi-file GGUF and GGUF-embedded tokenizer/chat-template are supported like
the reference (gguf/content.rs, gguf_tokenizer.rs).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from mistralrs_tpu.gguf.reader import GGMLType, GGUFFile
from mistralrs_tpu.gguf.tokenizer import convert_gguf_tokenizer
from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.decoder import DecoderParams
from mistralrs_tpu.models.loader import make_rope
from mistralrs_tpu.ops.rope import RopeTable
from mistralrs_tpu.quant.gguf_linear import linear_from_gguf
from mistralrs_tpu.quant.qlinear import Linear, make_dense


def config_from_gguf(g: GGUFFile) -> ModelConfig:
    a = g.architecture
    md = g.metadata
    if a not in ("llama",):
        raise ValueError(f"unsupported GGUF architecture {a!r} (only 'llama'-family yet)")

    def key(name, default=None):
        return md.get(f"{a}.{name}", default)

    heads = int(key("attention.head_count"))
    kv = int(key("attention.head_count_kv", heads))
    hidden = int(key("embedding_length"))
    n_experts = int(key("expert_count", 0) or 0)
    vocab = md.get(f"{a}.vocab_size")
    if vocab is None:
        vocab = len(md["tokenizer.ggml.tokens"])
    rope_dim = key("rope.dimension_count")
    head_dim = int(rope_dim) if rope_dim else hidden // heads
    return ModelConfig(
        arch="mixtral" if n_experts else "llama",
        vocab_size=int(vocab),
        hidden_size=hidden,
        intermediate_size=int(key("feed_forward_length")),
        num_layers=int(key("block_count")),
        num_heads=heads,
        num_kv_heads=kv,
        head_dim=head_dim,
        max_position_embeddings=int(key("context_length", 4096)),
        norm_eps=float(key("attention.layer_norm_rms_epsilon", 1e-5)),
        rope_theta=float(key("rope.freq_base", 10000.0)),
        num_experts=n_experts,
        num_experts_per_tok=int(key("expert_used_count", 0) or 0),
    )


def _qlin(g: GGUFFile, name: str, dtype) -> Linear:
    ti, raw = g.raw_tensor(name)
    return linear_from_gguf(raw, ti.ggml_type, ti.shape, dtype)


def _norm(g: GGUFFile, name: str, dtype) -> dict[str, Any]:
    p = {"w": jnp.asarray(g.tensor_f32(name), dtype)}
    bias = name.replace(".weight", ".bias")
    if bias in g:
        p["b"] = jnp.asarray(g.tensor_f32(bias), dtype)
    return p


def params_from_gguf(g: GGUFFile, cfg: ModelConfig, dtype=jnp.bfloat16) -> DecoderParams:
    import jax

    layers = []
    for i in range(cfg.num_layers):
        pre = f"blk.{i}"
        lp: dict[str, Any] = {
            "attn": {
                "q": _qlin(g, f"{pre}.attn_q.weight", dtype),
                "k": _qlin(g, f"{pre}.attn_k.weight", dtype),
                "v": _qlin(g, f"{pre}.attn_v.weight", dtype),
                "o": _qlin(g, f"{pre}.attn_output.weight", dtype),
            },
            "input_norm": _norm(g, f"{pre}.attn_norm.weight", dtype),
            "post_attn_norm": _norm(g, f"{pre}.ffn_norm.weight", dtype),
        }
        if cfg.is_moe:
            raise NotImplementedError("MoE GGUF (ffn_*_exps) lands with the EP kernels")
        lp["mlp"] = {
            "gate": _qlin(g, f"{pre}.ffn_gate.weight", dtype),
            "up": _qlin(g, f"{pre}.ffn_up.weight", dtype),
            "down": _qlin(g, f"{pre}.ffn_down.weight", dtype),
        }
        layers.append(lp)
    from mistralrs_tpu.models.loader import group_layers

    groups, sizes = group_layers(layers)

    embed = jnp.asarray(g.tensor_f32("token_embd.weight"), dtype)
    final_norm = _norm(g, "output_norm.weight", dtype)
    lm_head = None
    if "output.weight" in g:
        ti, raw = g.raw_tensor("output.weight")
        lm_head = linear_from_gguf(raw, ti.ggml_type, ti.shape, dtype)
    return DecoderParams(
        embed=embed, layer_groups=groups, final_norm=final_norm, lm_head=lm_head,
        group_sizes=sizes,
    )


def load_gguf_model(
    paths: str | list[str], dtype=jnp.bfloat16
) -> tuple[ModelConfig, DecoderParams, RopeTable, Any]:
    g = GGUFFile(paths)
    cfg = config_from_gguf(g)
    params = params_from_gguf(g, cfg, dtype)
    rope = make_rope(cfg)
    tokenizer = None
    try:
        tokenizer = convert_gguf_tokenizer(g.metadata)
    except ValueError:
        pass
    return cfg, params, rope, tokenizer
