"""Mesh construction + PartitionSpec rules for decoder params and KV pages."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.decoder import DecoderParams
from mistralrs_tpu.quant.qlinear import Linear


def make_mesh(
    devices: list[jax.Device] | None = None,
    *,
    dp: int = 1,
    sp: int = 1,
    tp: int | None = None,
) -> Mesh:
    """Build a ("dp", "sp", "tp") mesh. tp defaults to all devices / (dp*sp).

    sp is the sequence-parallel (ring attention) axis: weights are replicated
    over it and long-prefill activations are sequence-sharded; dp/tp carry
    the usual data/tensor parallelism."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        assert n % (dp * sp) == 0
        tp = n // (dp * sp)
    assert dp * sp * tp == n, (dp, sp, tp, n)
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, ("dp", "sp", "tp"))


def _lin_spec(kind: str, col_parallel: bool, stacked: bool, expert: bool = False) -> dict[str, Any]:
    """Specs for a Linear's data dict by kind.

    dense weights are (in, out); packed quant arrays are [out, blocks, ...]
    so column-parallel shards their leading `out` axis and row-parallel
    shards the block (in) axis."""
    prefix = (None,) if stacked else ()
    if expert:
        ep = prefix + ("tp",)  # expert-parallel leading axis
        if kind == "dense":
            return {"w": P(*ep, None, None), "b": P(*ep, None)}
        # packed GGUF experts: stacked [.., E, rows, out] quant arrays shard
        # on the expert axis; shared K-side perm tables replicate
        spec = P(*ep, None, None)
        return {
            "qs": spec, "scale": spec, "minv": spec, "q": spec,
            "ql": spec, "qh": spec,
            "perm": P(*prefix, None), "inv_perm": P(*prefix, None),
            "in_perm": P(*prefix, None), "g_idx": P(*prefix, None),
            "b": P(*ep, None),
        }
    if kind == "dense":
        if col_parallel:
            return {"w": P(*prefix, None, "tp"), "b": P(*prefix, "tp")}
        return {"w": P(*prefix, "tp", None), "b": P(*prefix, None)}
    bias = P(*prefix, "tp") if col_parallel else P(*prefix, None)
    if kind in ("gguf_q4k", "gguf_q5k", "gguf_q6k", "gguf_q2k", "gguf_q8_0",
                "gptq_2", "gptq_4", "gptq_8", "gptq_b8",
                "hqq_1", "hqq_2", "hqq_3", "hqq_4", "hqq_8"):
        # K-major 2D arrays [in-blocks, out]; q6k perm/inv_perm are global
        # element indices so they stay replicated under both layouts
        spec2 = P(*prefix, None, "tp") if col_parallel else P(*prefix, "tp", None)
        return {
            "qs": spec2, "scale": spec2, "minv": spec2, "q": spec2,
            "ql": spec2, "qh": spec2, "zs": spec2,
            "perm": P(*prefix, None), "inv_perm": P(*prefix, None),
            # act-order index vectors are [in]-sized gathers against the
            # K axis; replicated indices + sharded operand partition fine
            "in_perm": P(*prefix, None), "g_idx": P(*prefix, None),
            "b": bias,
        }


def param_specs(params: DecoderParams, cfg: ModelConfig) -> Any:
    """Pytree of PartitionSpec matching `params` (same treedef)."""

    def norm_spec(stacked: bool):
        pre = (None,) if stacked else ()
        return lambda p: {k: P(*pre) for k in p}

    def map_linear(lin: Linear, col: bool, stacked: bool, expert: bool = False) -> Linear:
        if lin.kind == "lora":
            # adapter banks follow the base layout: column-parallel shards
            # B's out axis, row-parallel shards A's in axis; per-adapter
            # scale/gates vectors replicate (lora/lora.py make_lora)
            pre = (None,) if stacked else ()
            data = {
                "base": map_linear(lin.data["base"], col, stacked, expert),
                "a": P(*pre, None, None, None) if col else P(*pre, None, "tp", None),
                "b": P(*pre, None, None, "tp") if col else P(*pre, None, None, None),
                "scale": P(*pre, None),
                "gates": P(*pre, None),
            }
            return Linear(kind=lin.kind, shape=lin.shape, data=data, meta=lin.meta)
        spec = _lin_spec(lin.kind, col, stacked, expert)
        if spec is None:
            raise NotImplementedError(f"no sharding spec for Linear kind {lin.kind!r}")
        data = {k: spec[k] for k in lin.data}
        return Linear(kind=lin.kind, shape=lin.shape, data=data, meta=lin.meta)

    def layer_specs(lp: dict[str, Any]) -> dict[str, Any]:
        out: dict[str, Any] = {}
        attn = lp["attn"]
        if "qkv" in attn:
            # shard-interleaved fused projection (quant/fuse.py interleave):
            # plain column-parallel sharding lands chunk s = [q_s|k_s|v_s]
            # on shard s with no reshuffle
            a: dict[str, Any] = {
                "qkv": map_linear(attn["qkv"], True, True),
                "o": map_linear(attn["o"], False, True),
            }
        elif "qk" in attn:
            # partial fusion (q/k fused, v separate — mixed-kind checkpoints)
            a = {
                "qk": map_linear(attn["qk"], True, True),
                "v": map_linear(attn["v"], True, True),
                "o": map_linear(attn["o"], False, True),
            }
        else:
            a = {
                "q": map_linear(attn["q"], True, True),
                "k": map_linear(attn["k"], True, True),
                "v": map_linear(attn["v"], True, True),
                "o": map_linear(attn["o"], False, True),
            }
        for nk in ("q_norm", "k_norm"):
            if nk in attn:
                a[nk] = norm_spec(True)(attn[nk])
        out["attn"] = a
        mlp = lp["mlp"]
        if "router" in mlp:  # MoE: router replicated, experts expert-parallel
            out["mlp"] = {
                "router": map_linear(mlp["router"], False, True),
                "experts": {
                    k: map_linear(v, False, True, expert=True)
                    for k, v in mlp["experts"].items()
                },
            }
            # router is small: replicate rather than row-parallel
            out["mlp"]["router"] = Linear(
                kind=mlp["router"].kind,
                shape=mlp["router"].shape,
                data={k: P(None, None, None) if k == "w" else P(None, None) for k in mlp["router"].data},
                meta=mlp["router"].meta,
            )
        elif "gateup" in mlp:
            out["mlp"] = {
                "gateup": map_linear(mlp["gateup"], True, True),
                "down": map_linear(mlp["down"], False, True),
            }
        elif "gate" in mlp:
            out["mlp"] = {
                "gate": map_linear(mlp["gate"], True, True),
                "up": map_linear(mlp["up"], True, True),
                "down": map_linear(mlp["down"], False, True),
            }
        else:
            out["mlp"] = {
                "fc1": map_linear(mlp["fc1"], True, True),
                "fc2": map_linear(mlp["fc2"], False, True),
            }
        for nk in ("input_norm", "post_attn_norm", "pre_mlp_norm", "post_mlp_norm"):
            if nk in lp:
                out[nk] = norm_spec(True)(lp[nk])
        return out

    def group_specs(g):
        if isinstance(g, (list, tuple)):
            # super-group (models/superscan.py): leaves are [n, p, ...] —
            # one extra leading replicated axis on every spec
            def add_axis(s):
                return P(None, *tuple(s)) if isinstance(s, P) else s

            return [
                jax.tree.map(add_axis, layer_specs(sub),
                             is_leaf=lambda x: isinstance(x, P))
                for sub in g
            ]
        return layer_specs(g)

    return DecoderParams(
        embed=P("tp", None),  # vocab-parallel
        layer_groups=[group_specs(g) for g in params.layer_groups],
        final_norm={k: P() for k in params.final_norm},
        lm_head=(
            None if params.lm_head is None else map_linear(params.lm_head, True, False)
        ),
        group_sizes=params.group_sizes,
    )


def shard_params(params: DecoderParams, cfg: ModelConfig, mesh: Mesh) -> DecoderParams:
    specs = param_specs(params, cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def cache_spec(head_major: bool = True) -> P:
    """KV pages: shard the KV-head axis over tp (axis 1 head-major
    [L, Hkv, P, page, D]; axis 3 token-major [L, P, page, Hkv, D])."""
    if head_major:
        return P(None, "tp", None, None, None)
    return P(None, None, None, "tp", None)


def shard_cache(cache, mesh: Mesh):
    hm = getattr(cache, "head_major", True)
    ns = NamedSharding(mesh, cache_spec(hm))
    if getattr(cache, "combined", False):
        # combined pool [L, P, page, 2*Hkv, D]: same head-axis shard
        return type(cache)(k=jax.device_put(cache.k, ns), v=None,
                           head_major=hm)
    if getattr(cache, "quantized", False):
        # int8 pools: scales drop the trailing D axis, same head-axis shard
        sspec = P(None, "tp", None, None) if hm else P(None, None, None, "tp")
        sns = NamedSharding(mesh, sspec)
        return type(cache)(k=jax.device_put(cache.k, ns),
                           v=jax.device_put(cache.v, ns),
                           k_scale=jax.device_put(cache.k_scale, sns),
                           v_scale=jax.device_put(cache.v_scale, sns),
                           head_major=hm)
    return type(cache)(k=jax.device_put(cache.k, ns),
                       v=jax.device_put(cache.v, ns),
                       head_major=hm)
