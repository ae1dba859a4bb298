"""HF checkpoint -> stacked `DecoderParams`.

Reference parity: mistralrs-core/src/pipeline/normal.rs `load_model_from_path`
(:224-391) + utils/varbuilder_utils.rs `from_mmaped_safetensors` (:78-120).
Safetensors files are mmapped and tensors copied straight into the stacked
[L, ...] device layout — the transpose-to-(in, out) happens once at load.

Name mapping covers the nine text architectures (see models/config.py); fused
projections (phi3 qkv_proj / gate_up_proj) are split here so the runtime core
stays uniform.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from mistralrs_tpu.models.config import ModelConfig, config_from_hf
from mistralrs_tpu.models.decoder import DecoderParams
from mistralrs_tpu.ops.rope import RopeTable, compute_rope_table
from mistralrs_tpu.quant.qlinear import Linear, make_dense


class TensorSource:
    """Lazy tensor lookup over one or more safetensors shards (or a dict)."""

    def __init__(self, get: Callable[[str], np.ndarray], names: set[str]):
        self.get = get
        self.names = names

    def __contains__(self, name: str) -> bool:
        return name in self.names

    def __call__(self, name: str) -> np.ndarray:
        return self.get(name)

    @classmethod
    def from_dict(cls, tensors: dict[str, np.ndarray]) -> "TensorSource":
        return cls(lambda n: tensors[n], set(tensors))

    @classmethod
    def from_safetensors_dir(cls, path: str) -> "TensorSource":
        from safetensors import safe_open

        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".safetensors")
        )
        handles = [safe_open(f, framework="np") for f in files]
        where: dict[str, Any] = {}
        for h in handles:
            for name in h.keys():
                where[name] = h
        return cls(lambda n: where[n].get_tensor(n), set(where))


def _to_jnp(a: np.ndarray, dtype) -> jax.Array:
    return jnp.asarray(a).astype(dtype)


def _maybe_quantize(w_out_in: np.ndarray, b: np.ndarray | None, gtype, dtype) -> Linear | None:
    """ISQ a (out, in) torch-layout weight into a packed device Linear."""
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.gguf_linear import linear_from_gguf
    from mistralrs_tpu.quant.hqq import HqqType, quantize_hqq
    from mistralrs_tpu.quant.isq import quantizable

    if gtype is None or not quantizable(w_out_in.shape, gtype):
        return None
    if isinstance(gtype, HqqType):
        return quantize_hqq(
            w_out_in.astype(np.float32), gtype.bits, gtype.group_size,
            dtype=dtype, bias=b,
        )
    raw = kquants.quantize(w_out_in.astype(np.float32), gtype)
    lin = linear_from_gguf(raw, gtype, w_out_in.shape, dtype)
    if lin.kind == "dense":  # packer fell back; not worth it
        return None
    if b is not None:
        lin.data["b"] = _to_jnp(b, dtype)
    return lin


def _lin(src: TensorSource, prefix: str, dtype, transpose: bool = True, isq=None,
         gptq: dict | None = None) -> Linear:
    if gptq is not None and (prefix + ".qweight") in src:
        # AutoGPTQ checkpoint projection (ref gptq_linear lib.rs:234-272)
        from mistralrs_tpu.quant.gptq import gptq_linear_from_tensors

        bits = int(gptq["bits"])
        qw = src(prefix + ".qweight")
        in_f = (qw.shape[0] // 3) * 32 if bits == 3 else qw.shape[0] * (32 // bits)
        return gptq_linear_from_tensors(
            qw,
            src(prefix + ".qzeros"),
            src(prefix + ".scales").astype(np.float32),
            src(prefix + ".g_idx") if (prefix + ".g_idx") in src else None,
            bits,
            in_f,
            qw.shape[1],
            dtype=dtype,
            zero_plus_one=gptq.get("zero_plus_one", True),
            bias=src(prefix + ".bias") if (prefix + ".bias") in src else None,
        )
    w = src(prefix + ".weight")
    b = src(prefix + ".bias") if (prefix + ".bias") in src else None
    if isq is not None:
        q = _maybe_quantize(w, b, isq, dtype)
        if q is not None:
            return q
    if transpose:
        w = np.ascontiguousarray(w.T)  # torch (out,in) -> (in,out)
    return make_dense(_to_jnp(w, dtype), None if b is None else _to_jnp(b, dtype))


def _norm_p(src: TensorSource, prefix: str, dtype) -> dict[str, jax.Array]:
    p = {"w": _to_jnp(src(prefix + ".weight"), dtype)}
    if (prefix + ".bias") in src:
        p["b"] = _to_jnp(src(prefix + ".bias"), dtype)
    return p


def _split_lin(lin_w: np.ndarray, lin_b: np.ndarray | None, sizes: list[int], dtype, isq=None) -> list[Linear]:
    """Split a fused torch (out, in) projection row-wise into parts."""
    outs = []
    off = 0
    for s in sizes:
        wp = np.ascontiguousarray(lin_w[off : off + s])
        bp = None if lin_b is None else lin_b[off : off + s]
        q = _maybe_quantize(wp, bp, isq, dtype) if isq is not None else None
        if q is not None:
            outs.append(q)
        else:
            outs.append(
                make_dense(
                    _to_jnp(np.ascontiguousarray(wp.T), dtype),
                    None if bp is None else _to_jnp(bp, dtype),
                )
            )
        off += s
    assert off == lin_w.shape[0]
    return outs


def _layer_params(cfg: ModelConfig, src: TensorSource, i: int, dtype, isq=None,
                  gptq: dict | None = None) -> dict[str, Any]:
    pre = f"model.layers.{i}"
    a = f"{pre}.self_attn"
    p: dict[str, Any] = {}

    # attention projections
    if f"{a}.qkv_proj.weight" in src:  # phi3 fused
        qs = cfg.num_heads * cfg.head_dim
        ks = cfg.num_kv_heads * cfg.head_dim
        w = src(f"{a}.qkv_proj.weight")
        b = src(f"{a}.qkv_proj.bias") if f"{a}.qkv_proj.bias" in src else None
        q, k, v = _split_lin(w, b, [qs, ks, ks], dtype, isq=isq)
        attn = {"q": q, "k": k, "v": v}
    else:
        attn = {
            "q": _lin(src, f"{a}.q_proj", dtype, isq=isq, gptq=gptq),
            "k": _lin(src, f"{a}.k_proj", dtype, isq=isq, gptq=gptq),
            "v": _lin(src, f"{a}.v_proj", dtype, isq=isq, gptq=gptq),
        }
    if f"{a}.o_proj.weight" in src or (gptq and f"{a}.o_proj.qweight" in src):
        attn["o"] = _lin(src, f"{a}.o_proj", dtype, isq=isq, gptq=gptq)
    else:  # phi2 names it "dense"
        attn["o"] = _lin(src, f"{a}.dense", dtype, isq=isq, gptq=gptq)
    if cfg.qk_norm:
        attn["q_norm"] = _norm_p(src, f"{a}.q_layernorm", dtype)
        attn["k_norm"] = _norm_p(src, f"{a}.k_layernorm", dtype)
    p["attn"] = attn

    # mlp
    m = f"{pre}.mlp"
    if cfg.is_moe:
        moe = f"{pre}.block_sparse_moe"
        gates, ups, downs = [], [], []
        for e in range(cfg.num_experts):
            gates.append(np.ascontiguousarray(src(f"{moe}.experts.{e}.w1.weight").T))
            ups.append(np.ascontiguousarray(src(f"{moe}.experts.{e}.w3.weight").T))
            downs.append(np.ascontiguousarray(src(f"{moe}.experts.{e}.w2.weight").T))
        p["mlp"] = {
            "router": _lin(src, f"{moe}.gate", dtype, isq=isq),
            "experts": {
                "gate": make_dense(_to_jnp(np.stack(gates), dtype)),
                "up": make_dense(_to_jnp(np.stack(ups), dtype)),
                "down": make_dense(_to_jnp(np.stack(downs), dtype)),
            },
        }
    elif f"{m}.gate_up_proj.weight" in src:  # phi3 fused
        w = src(f"{m}.gate_up_proj.weight")
        gate, up = _split_lin(w, None, [cfg.intermediate_size, cfg.intermediate_size], dtype, isq=isq)
        p["mlp"] = {"gate": gate, "up": up, "down": _lin(src, f"{m}.down_proj", dtype, isq=isq)}
    elif cfg.mlp_style == "gated":
        p["mlp"] = {
            "gate": _lin(src, f"{m}.gate_proj", dtype, isq=isq, gptq=gptq),
            "up": _lin(src, f"{m}.up_proj", dtype, isq=isq, gptq=gptq),
            "down": _lin(src, f"{m}.down_proj", dtype, isq=isq, gptq=gptq),
        }
    else:  # plain fc1/fc2 (phi2) or c_fc/c_proj (starcoder2)
        if f"{m}.fc1.weight" in src or (gptq and f"{m}.fc1.qweight" in src):
            p["mlp"] = {"fc1": _lin(src, f"{m}.fc1", dtype, isq=isq, gptq=gptq),
                        "fc2": _lin(src, f"{m}.fc2", dtype, isq=isq, gptq=gptq)}
        else:
            p["mlp"] = {"fc1": _lin(src, f"{m}.c_fc", dtype, isq=isq, gptq=gptq),
                        "fc2": _lin(src, f"{m}.c_proj", dtype, isq=isq, gptq=gptq)}

    # norms
    p["input_norm"] = _norm_p(src, f"{pre}.input_layernorm", dtype)
    if cfg.block_style == "sandwich":
        p["post_attn_norm"] = _norm_p(src, f"{pre}.post_attention_layernorm", dtype)
        p["pre_mlp_norm"] = _norm_p(src, f"{pre}.pre_feedforward_layernorm", dtype)
        p["post_mlp_norm"] = _norm_p(src, f"{pre}.post_feedforward_layernorm", dtype)
    elif cfg.block_style != "parallel":
        p["post_attn_norm"] = _norm_p(src, f"{pre}.post_attention_layernorm", dtype)
    return p


def group_layers(layers: list[dict[str, Any]]) -> tuple[list[dict[str, Any]], tuple[int, ...]]:
    """Stack consecutive layers with identical structure into scan groups.

    The treedef captures Linear kinds (static aux data), so mixed-quant
    checkpoints split exactly where the format changes."""

    def sig(lp):
        leaves, treedef = jax.tree.flatten(lp)
        return (str(treedef), tuple((tuple(x.shape), str(x.dtype)) for x in leaves))

    runs: list[list[dict[str, Any]]] = []
    cur_sig = None
    for lp in layers:
        s = sig(lp)
        if runs and s == cur_sig:
            runs[-1].append(lp)
        else:
            runs.append([lp])
            cur_sig = s
    stacked = [jax.tree.map(lambda *xs: jnp.stack(xs), *run) for run in runs]
    return stacked, tuple(len(run) for run in runs)


def split_oversized_groups(params, max_layers: int):
    """Split any stacked scan group larger than `max_layers` into
    consecutive sub-groups (pure restructuring: N scans over the same
    layers in the same order). Used by the split KV pool (pipeline/text):
    each group gets its own pool part, so a 32-layer homogeneous model at
    32k context would otherwise still hold one >4 GB array. Super-groups
    (list-typed, models/superscan.py) are left alone."""
    import dataclasses

    from mistralrs_tpu.quant.qlinear import Linear

    is_lin = lambda x: isinstance(x, Linear)  # noqa: E731
    groups, sizes, changed = [], [], False
    for g, s in zip(params.layer_groups, params.group_sizes):
        if s <= max_layers or isinstance(g, (list, tuple)):
            groups.append(g)
            sizes.append(s)
            continue
        n = -(-s // max_layers)
        base, rem = s // n, s % n
        off = 0
        for i in range(n):
            take = base + (1 if i < rem else 0)

            def cut(x, off=off, take=take):
                if is_lin(x):
                    return Linear(kind=x.kind, shape=x.shape,
                                  data={k: v[off : off + take]
                                        for k, v in x.data.items()},
                                  meta=x.meta)
                return x[off : off + take]

            groups.append(jax.tree.map(cut, g, is_leaf=is_lin))
            sizes.append(take)
            off += take
        changed = True
    if not changed:
        return params
    return dataclasses.replace(params, layer_groups=groups,
                               group_sizes=tuple(sizes))


def params_from_source(
    cfg: ModelConfig,
    src: TensorSource,
    dtype=jnp.bfloat16,
    isq=None,
    topology=None,
    gptq_cfg: dict | None = None,
) -> DecoderParams:
    """isq: GGMLType, HqqType, or ISQ string (e.g. "Q4K"/"HQQ4") applied to
    every linear; topology: quant.isq.Topology overriding per layer (ref
    pipeline/isq.rs + topology/mod.rs); gptq_cfg: AutoGPTQ checkpoint info
    ({bits, zero_plus_one}) enabling qweight/qzeros/scales loading."""
    if isinstance(isq, str):
        from mistralrs_tpu.quant.isq import parse_isq

        isq = parse_isq(isq)

    def layer_isq(i):
        if topology is not None:
            return topology.isq_for_layer(i, isq)
        return isq

    layers = [
        _layer_params(cfg, src, i, dtype, isq=layer_isq(i), gptq=gptq_cfg)
        for i in range(cfg.num_layers)
    ]
    groups, sizes = group_layers(layers)
    embed = _to_jnp(src("model.embed_tokens.weight"), dtype)
    if "model.norm.weight" in src:
        final_norm = _norm_p(src, "model.norm", dtype)
    else:  # phi2
        final_norm = _norm_p(src, "model.final_layernorm", dtype)
    lm_head = None
    if not cfg.tie_word_embeddings and "lm_head.weight" in src:
        lm_head = _lin(src, "lm_head", dtype, isq=isq)
    return DecoderParams(
        embed=embed, layer_groups=groups, final_norm=final_norm, lm_head=lm_head,
        group_sizes=sizes,
    )


def load_hf_model(
    path: str,
    dtype=jnp.bfloat16,
    max_position_embeddings: int | None = None,
    isq=None,
    topology=None,
) -> tuple[ModelConfig, DecoderParams, RopeTable]:
    """Load config.json + *.safetensors from a local HF model directory,
    optionally ISQ-quantizing linears (isq string/GGMLType, topology YAML)."""
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = config_from_hf(hf)
    src = TensorSource.from_safetensors_dir(path)
    if isinstance(topology, str):
        from mistralrs_tpu.quant.isq import Topology

        topology = Topology.from_yaml_file(topology, cfg.num_layers)
    gptq_cfg = None
    qc = hf.get("quantization_config")
    if qc and qc.get("quant_method") == "gptq":
        gptq_cfg = {
            "bits": int(qc.get("bits", 4)),
            "zero_plus_one": qc.get("checkpoint_format", "gptq") != "gptq_v2",
        }
    params = params_from_source(cfg, src, dtype, isq=isq, topology=topology,
                                gptq_cfg=gptq_cfg)
    rope = make_rope(cfg, max_position_embeddings)
    return cfg, params, rope


def make_rope(cfg: ModelConfig, max_pos: int | None = None) -> RopeTable:
    return compute_rope_table(
        cfg.head_dim,
        max_pos or cfg.max_position_embeddings,
        theta=cfg.rope_theta,
        rope_scaling=cfg.rope_scaling,
        partial_rotary_factor=cfg.partial_rotary_factor,
        original_max_position_embeddings=cfg.original_max_position_embeddings,
    )
