"""GGUF model pipeline: quantized checkpoint -> runnable model.

Reference parity: mistralrs-core/src/pipeline/gguf.rs (GGUFPipeline/Loader,
model enum :59-66) + the quantized model impls it dispatches to:
models/quantized_llama.rs `ModelWeights::from_gguf` (:397, llama/mistral and
the Mixtral MoE branch :473-530), quantized_phi2.rs, quantized_phi3.rs,
quantized_starcoder2.rs. Metadata keys -> ModelConfig; weight tensors stay
packed (quant/gguf_linear device formats); norms/embeddings are dequantized
(embeddings must be gatherable). Fused GGUF tensors (phi attn_qkv, phi3
gate_up-style ffn_up) are column-split into separate projections at load —
exact, because quant blocks run along the `in` axis (quant/fuse.split_linear)
— where the reference instead slices activations after the fused matmul
(quantized_phi3.rs:87-92). Mixtral experts are split from the stacked
`ffn_*_exps` bytes directly (the reference dequantizes and re-quantizes
per expert, :483-492) or gathered from per-expert `ffn_gate.{e}` tensors.

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
from mistralrs_tpu.quant.fuse import split_linear
from mistralrs_tpu.quant.gguf_linear import linear_from_gguf
from mistralrs_tpu.quant.qlinear import Linear, make_dense

SUPPORTED_ARCHS = ("llama", "phi2", "phi3", "starcoder2")


def config_from_gguf(g: GGUFFile) -> ModelConfig:
    a = g.architecture
    md = g.metadata
    if a not in SUPPORTED_ARCHS:
        raise ValueError(
            f"unsupported GGUF architecture {a!r} (supported: {SUPPORTED_ARCHS})"
        )

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
    base = dict(
        vocab_size=int(vocab),
        hidden_size=hidden,
        intermediate_size=int(key("feed_forward_length")),
        num_layers=int(key("block_count")),
        num_heads=heads,
        num_kv_heads=kv,
        max_position_embeddings=int(key("context_length", 4096)),
        rope_theta=float(key("rope.freq_base", 10000.0)),
    )
    if a == "llama":
        return ModelConfig(
            arch="mixtral" if n_experts else "llama",
            head_dim=int(rope_dim) if rope_dim else hidden // heads,
            norm_eps=float(key("attention.layer_norm_rms_epsilon", 1e-5)),
            num_experts=n_experts,
            num_experts_per_tok=int(key("expert_used_count", 0) or 0),
            **base,
        )
    if a == "phi2":
        head_dim = hidden // heads
        return ModelConfig(
            arch="phi2",
            head_dim=head_dim,
            norm="layernorm",
            norm_eps=float(key("attention.layer_norm_epsilon", 1e-5)),
            block_style="parallel",
            mlp_style="plain",
            act="gelu_new",
            partial_rotary_factor=(int(rope_dim) / head_dim) if rope_dim else 0.4,
            qkv_bias=True,
            o_bias=True,
            mlp_bias=True,
            lm_head_bias=True,
            **base,
        )
    if a == "phi3":
        sw = key("attention.sliding_window")
        orig = key("rope.scaling.original_context_length")
        rope_scaling = None
        if "rope_factors_long.weight" in g and "rope_factors_short.weight" in g:
            rope_scaling = {
                "rope_type": "longrope",
                "long_factor": [float(v) for v in g.tensor_f32("rope_factors_long.weight")],
                "short_factor": [float(v) for v in g.tensor_f32("rope_factors_short.weight")],
            }
        return ModelConfig(
            arch="phi3",
            head_dim=int(rope_dim) if rope_dim else hidden // heads,
            norm_eps=float(key("attention.layer_norm_rms_epsilon", 1e-5)),
            sliding_window=int(sw) if sw else None,
            sliding_window_pattern="all" if sw else "none",
            rope_scaling=rope_scaling,
            original_max_position_embeddings=int(orig) if orig else None,
            **base,
        )
    # starcoder2 (ref quantized_starcoder2.rs)
    return ModelConfig(
        arch="starcoder2",
        head_dim=hidden // heads,
        norm="layernorm",
        norm_eps=float(key("attention.layer_norm_epsilon", 1e-5)),
        mlp_style="plain",
        act="gelu_pytorch_tanh",
        qkv_bias=True,
        o_bias=True,
        mlp_bias=True,
        sliding_window=int(key("attention.sliding_window")) if key("attention.sliding_window") else None,
        sliding_window_pattern="all" if key("attention.sliding_window") else "none",
        tie_word_embeddings="output.weight" not in g,
        **base,
    )


def _qlin(g: GGUFFile, name: str, dtype, bias: bool = True) -> Linear:
    ti, raw = g.raw_tensor(name)
    lin = linear_from_gguf(raw, ti.ggml_type, ti.shape, dtype)
    bname = name.replace(".weight", ".bias")
    if bias and bname in g:
        lin.data["b"] = jnp.asarray(g.tensor_f32(bname), dtype)
    return lin


def _norm(g: GGUFFile, name: str, dtype) -> dict[str, Any]:
    p = {"w": jnp.asarray(g.tensor_f32(name), dtype)}
    bias = name.replace(".weight", ".bias")
    if bias in g:
        p["b"] = jnp.asarray(g.tensor_f32(bias), dtype)
    return p


def _split_qkv(g: GGUFFile, name: str, cfg: ModelConfig, dtype) -> dict[str, Linear]:
    """GGUF-fused attn_qkv -> separate q/k/v (column split; exact)."""
    fused = _qlin(g, name, dtype)
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    q, k, v = split_linear(fused, [qd, kvd, kvd])
    return {"q": q, "k": k, "v": v}


def _stack_linears(lins: list[Linear]) -> Linear:
    """Stack same-kind Linears on a new leading expert axis (perm tables
    are K-side constants shared across experts — kept unstacked)."""
    kinds = {l.kind for l in lins}
    if len(kinds) != 1:
        raise ValueError(f"experts with mixed quant kinds {kinds} unsupported")
    base = lins[0]
    data = {}
    for k in base.data:
        if k in ("perm", "inv_perm"):
            data[k] = base.data[k]
        else:
            data[k] = jnp.stack([l.data[k] for l in lins], axis=0)
    return Linear(kind=base.kind, shape=base.shape, data=data, meta=base.meta)


def _moe_mlp_params(g: GGUFFile, pre: str, cfg: ModelConfig, dtype) -> dict[str, Any]:
    """Mixtral GGUF experts (ref quantized_llama.rs:473-530): stacked
    `ffn_*_exps` 3D tensors split by expert from the raw bytes, or legacy
    per-expert `ffn_gate.{e}` tensors."""
    router = _qlin(g, f"{pre}.ffn_gate_inp.weight", dtype, bias=False)
    experts: dict[str, Linear] = {}
    for key, gname in (("gate", "ffn_gate"), ("up", "ffn_up"), ("down", "ffn_down")):
        exps_name = f"{pre}.{gname}_exps.weight"
        if exps_name in g:
            ti, raw = g.raw_tensor(exps_name)
            E, out_f, in_f = ti.shape
            per = raw.reshape(E, -1)
            lins = [
                linear_from_gguf(per[e], ti.ggml_type, (out_f, in_f), dtype)
                for e in range(E)
            ]
        else:
            lins = [
                _qlin(g, f"{pre}.{gname}.{e}.weight", dtype, bias=False)
                for e in range(cfg.num_experts)
            ]
        experts[key] = _stack_linears(lins)
    return {"router": router, "experts": experts}


def params_from_gguf(g: GGUFFile, cfg: ModelConfig, dtype=jnp.bfloat16) -> DecoderParams:
    a = g.architecture
    layers = []
    for i in range(cfg.num_layers):
        pre = f"blk.{i}"
        lp: dict[str, Any] = {"input_norm": _norm(g, f"{pre}.attn_norm.weight", dtype)}
        # attention: separate projections (llama/starcoder2) or fused qkv (phi)
        if f"{pre}.attn_qkv.weight" in g:
            attn = _split_qkv(g, f"{pre}.attn_qkv.weight", cfg, dtype)
        else:
            attn = {
                "q": _qlin(g, f"{pre}.attn_q.weight", dtype),
                "k": _qlin(g, f"{pre}.attn_k.weight", dtype),
                "v": _qlin(g, f"{pre}.attn_v.weight", dtype),
            }
        attn["o"] = _qlin(g, f"{pre}.attn_output.weight", dtype)
        lp["attn"] = attn
        # mlp by style
        if cfg.is_moe:
            lp["mlp"] = _moe_mlp_params(g, pre, cfg, dtype)
        elif cfg.mlp_style == "plain":
            lp["mlp"] = {
                "fc1": _qlin(g, f"{pre}.ffn_up.weight", dtype),
                "fc2": _qlin(g, f"{pre}.ffn_down.weight", dtype),
            }
        elif a == "phi3":
            # phi3 GGUF stores gate|up fused as ffn_up (2*intermediate)
            gate, up = split_linear(
                _qlin(g, f"{pre}.ffn_up.weight", dtype),
                [cfg.intermediate_size, cfg.intermediate_size],
            )
            lp["mlp"] = {
                "gate": gate,
                "up": up,
                "down": _qlin(g, f"{pre}.ffn_down.weight", dtype),
            }
        else:
            lp["mlp"] = {
                "gate": _qlin(g, f"{pre}.ffn_gate.weight", dtype),
                "up": _qlin(g, f"{pre}.ffn_up.weight", dtype),
                "down": _qlin(g, f"{pre}.ffn_down.weight", dtype),
            }
        # parallel blocks (phi2) have no ffn_norm; prenorm archs do
        if cfg.block_style != "parallel":
            lp["post_attn_norm"] = _norm(g, f"{pre}.ffn_norm.weight", dtype)
        layers.append(lp)
    from mistralrs_tpu.models.loader import group_layers

    groups, sizes = group_layers(layers)

    embed = jnp.asarray(g.tensor_f32("token_embd.weight"), dtype)
    final_norm = _norm(g, "output_norm.weight", dtype)
    lm_head = None
    if "output.weight" in g:
        lm_head = _qlin(g, "output.weight", dtype)
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
