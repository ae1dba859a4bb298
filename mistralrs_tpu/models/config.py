"""Unified decoder configuration + per-architecture HF config translators.

Reference parity: the per-model `Config` structs in
mistralrs-core/src/models/{llama,mistral,mixtral,gemma,gemma2,phi2,phi3,
qwen2,starcoder2}.rs. One dataclass holds the union of their knobs; the
translators map HF `config.json` dicts (the same source the reference
deserializes) into it. All fields are static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    arch: str
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    max_position_embeddings: int = 4096

    # norms
    norm: str = "rmsnorm"  # rmsnorm | layernorm
    norm_eps: float = 1e-5
    norm_offset: float = 0.0  # 1.0 for gemma-family zero-centered weights

    # block topology
    block_style: str = "prenorm"  # prenorm | sandwich (gemma2) | parallel (phi2)
    mlp_style: str = "gated"  # gated (gate/up/down) | plain (fc1/fc2)
    act: str = "silu"

    # rope
    rope_theta: float = 10000.0
    rope_scaling: dict[str, Any] | None = None
    partial_rotary_factor: float = 1.0
    original_max_position_embeddings: int | None = None

    # attention
    sliding_window: int | None = None
    # which layers use the sliding window: "none" | "all" | "alternate"
    # (gemma2: even layers local; ref models/gemma2.rs sliding logic)
    sliding_window_pattern: str = "none"
    attn_logit_softcap: float | None = None
    final_logit_softcap: float | None = None
    query_scale: float | None = None  # overrides 1/sqrt(head_dim) (gemma2 query_pre_attn_scalar)
    qkv_bias: bool = False
    o_bias: bool = False
    mlp_bias: bool = False
    lm_head_bias: bool = False
    qk_norm: bool = False

    # embeddings
    tie_word_embeddings: bool = False
    embed_scale: float = 1.0  # gemma: sqrt(hidden_size)

    # MoE (mixtral)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    # MoE dispatch: grouped dropless GEMMs via lax.ragged_dot (exact; set by
    # the pipeline for unsharded runs) vs dense every-expert einsum (used
    # under expert-parallel sharding, where ragged grouping would fight the
    # expert-axis partitioning)
    moe_grouped: bool = False

    # Fused-projection shard interleave (quant/fuse.py): chunk s of a fused
    # qkv/gateup out axis holds shard s's [q_s|k_s|v_s] / [gate_s|up_s], so
    # plain column-parallel TP sharding lands each device exactly its heads
    # with zero collectives. 1 = plain concatenation (unsharded).
    fuse_interleave: int = 1

    def __post_init__(self):
        assert self.num_heads % self.num_kv_heads == 0

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    def layer_uses_sliding_window(self, layer_idx: int) -> bool:
        if self.sliding_window is None or self.sliding_window_pattern == "none":
            return False
        if self.sliding_window_pattern == "all":
            return True
        return layer_idx % 2 == 0  # gemma2 alternate: even layers local


def _base(hf: dict[str, Any], arch: str, **over: Any) -> ModelConfig:
    num_heads = hf["num_attention_heads"]
    num_kv = hf.get("num_key_value_heads", num_heads)
    hidden = hf["hidden_size"]
    fields = dict(
        arch=arch,
        vocab_size=hf["vocab_size"],
        hidden_size=hidden,
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=num_heads,
        num_kv_heads=num_kv,
        head_dim=hf.get("head_dim") or hidden // num_heads,
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        norm_eps=hf.get("rms_norm_eps", hf.get("norm_epsilon", hf.get("layer_norm_eps", 1e-5))),
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_scaling=hf.get("rope_scaling"),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        act=hf.get("hidden_act") or hf.get("hidden_activation") or "silu",
    )
    fields.update(over)
    return ModelConfig(**fields)


def _llama(hf):  # ref models/llama.rs
    return _base(hf, "llama")


def _mistral(hf):  # ref models/mistral.rs
    return _base(
        hf, "mistral",
        sliding_window=hf.get("sliding_window"),
        sliding_window_pattern="all" if hf.get("sliding_window") else "none",
    )


def _mixtral(hf):  # ref models/mixtral.rs
    return _base(
        hf, "mixtral",
        sliding_window=hf.get("sliding_window"),
        sliding_window_pattern="all" if hf.get("sliding_window") else "none",
        num_experts=hf["num_local_experts"],
        num_experts_per_tok=hf["num_experts_per_tok"],
    )


def _gemma(hf):  # ref models/gemma.rs
    return _base(
        hf, "gemma",
        norm_offset=1.0,
        norm_eps=hf.get("rms_norm_eps", 1e-6),
        embed_scale=hf["hidden_size"] ** 0.5,
        tie_word_embeddings=True,
        act=hf.get("hidden_activation") or hf.get("hidden_act") or "gelu_pytorch_tanh",
    )


def _gemma2(hf):  # ref models/gemma2.rs
    scalar = hf.get("query_pre_attn_scalar")
    return _base(
        hf, "gemma2",
        norm_offset=1.0,
        norm_eps=hf.get("rms_norm_eps", 1e-6),
        embed_scale=hf["hidden_size"] ** 0.5,
        tie_word_embeddings=True,
        block_style="sandwich",
        act=hf.get("hidden_activation") or "gelu_pytorch_tanh",
        sliding_window=hf.get("sliding_window", 4096),
        sliding_window_pattern="alternate",
        attn_logit_softcap=hf.get("attn_logit_softcapping", 50.0),
        final_logit_softcap=hf.get("final_logit_softcapping", 30.0),
        query_scale=(scalar**-0.5) if scalar else None,
    )


def _phi2(hf):  # ref models/phi2.rs
    return _base(
        hf, "phi2",
        norm="layernorm",
        norm_eps=hf.get("layer_norm_eps", 1e-5),
        block_style="parallel",
        mlp_style="plain",
        act=hf.get("hidden_act", "gelu_new"),
        partial_rotary_factor=hf.get("partial_rotary_factor", 0.4),
        qkv_bias=True,
        o_bias=True,
        mlp_bias=True,
        lm_head_bias=True,
        qk_norm=hf.get("qk_layernorm", False),
    )


def _phi3(hf):  # ref models/phi3.rs (fused qkv/gate_up split at load)
    return _base(
        hf, "phi3",
        sliding_window=hf.get("sliding_window"),
        sliding_window_pattern="all" if hf.get("sliding_window") else "none",
        original_max_position_embeddings=hf.get("original_max_position_embeddings"),
    )


def _qwen2(hf):  # ref models/qwen2.rs
    return _base(
        hf, "qwen2",
        qkv_bias=True,
        sliding_window=hf.get("sliding_window") if hf.get("use_sliding_window") else None,
        sliding_window_pattern="all" if hf.get("use_sliding_window") else "none",
    )


def _starcoder2(hf):  # ref models/starcoder2.rs
    return _base(
        hf, "starcoder2",
        norm="layernorm",
        norm_eps=hf.get("norm_epsilon", 1e-5),
        mlp_style="plain",
        act=hf.get("hidden_act", "gelu_pytorch_tanh"),
        qkv_bias=hf.get("use_bias", True),
        o_bias=hf.get("use_bias", True),
        mlp_bias=hf.get("use_bias", True),
        sliding_window=hf.get("sliding_window"),
        sliding_window_pattern="all" if hf.get("sliding_window") else "none",
        tie_word_embeddings=hf.get("tie_word_embeddings", True),
    )


_TRANSLATORS = {
    "LlamaForCausalLM": _llama,
    "MistralForCausalLM": _mistral,
    "MixtralForCausalLM": _mixtral,
    "GemmaForCausalLM": _gemma,
    "Gemma2ForCausalLM": _gemma2,
    "PhiForCausalLM": _phi2,
    "Phi3ForCausalLM": _phi3,
    "Qwen2ForCausalLM": _qwen2,
    "Starcoder2ForCausalLM": _starcoder2,
    # model_type aliases
    "llama": _llama,
    "mistral": _mistral,
    "mixtral": _mixtral,
    "gemma": _gemma,
    "gemma2": _gemma2,
    "phi": _phi2,
    "phi3": _phi3,
    "qwen2": _qwen2,
    "starcoder2": _starcoder2,
}


def config_from_hf(hf: dict[str, Any]) -> ModelConfig:
    """Translate an HF `config.json` dict. Tries `architectures[0]`, then `model_type`."""
    archs = hf.get("architectures") or []
    for a in archs:
        if a in _TRANSLATORS:
            return _TRANSLATORS[a](hf)
    mt = hf.get("model_type")
    if mt in _TRANSLATORS:
        return _TRANSLATORS[mt](hf)
    raise ValueError(f"unsupported architecture: {archs or mt}")
