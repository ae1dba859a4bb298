"""LoRA adapter layers on the polymorphic `Linear`.

Reference parity: mistralrs-core/src/lora/ — `LoraLinear` (loralinear.rs:13,
unmerged runtime adapters, batched via stacked A/B), `QLoraLinear`
(qloralinear.rs, quantized base + adapters), `Merge::merge_weights`, and
`AdapterSwapper` runtime activation (lora/mod.rs:98-131).

TPU design: all n adapters for one projection are *stacked* —
a: [n, in, r], b: [n, r, out] — and modulated by a `gates` data leaf [n]
(1.0 = active). Activating/deactivating adapters is a pure data update on
identically-shaped arrays, so `jit` never recompiles on adapter swap (the
reference re-walks Arc'd layers instead). X-LoRA feeds per-token scalings
through the same forward (see lora/xlora.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mistralrs_tpu.quant.qlinear import Linear, linear, make_dense, register_kind

# our param-tree addresses for the wrappable projections, by reference name
TARGET_KEYS = {
    "q_proj": ("attn", "q"),
    "k_proj": ("attn", "k"),
    "v_proj": ("attn", "v"),
    "o_proj": ("attn", "o"),
    "dense": ("attn", "o"),  # phi2
    "gate_proj": ("mlp", "gate"),
    "up_proj": ("mlp", "up"),
    "down_proj": ("mlp", "down"),
    "fc1": ("mlp", "fc1"),
    "fc2": ("mlp", "fc2"),
    "c_fc": ("mlp", "fc1"),
    "c_proj": ("mlp", "fc2"),
}


@dataclasses.dataclass
class LoraAdapter:
    """One adapter's host-side weights.

    weights: "{layer_idx}.{target}" -> (A [r, in], B [out, r]) in torch layout
    (PEFT convention); scale = alpha / r (ref loralinear.rs scale calc).
    """

    name: str
    r: int
    alpha: float
    weights: dict[str, tuple[np.ndarray, np.ndarray]]

    @property
    def scale(self) -> float:
        return self.alpha / self.r if self.r > 0 else 1.0


@register_kind("lora")
def _lora_forward(lin: Linear, x: jax.Array, scales: jax.Array | None = None) -> jax.Array:
    base: Linear = lin.data["base"]
    y = linear(base, x)
    a = lin.data["a"].astype(x.dtype)  # [n, in, r]
    b = lin.data["b"].astype(x.dtype)  # [n, r, out]
    g = (lin.data["gates"] * lin.data["scale"]).astype(x.dtype)  # [n]
    xa = jnp.einsum("...i,nir->...nr", x, a)
    if scales is not None:
        # X-LoRA per-token scalings [..., n]
        xa = xa * (g * scales.astype(x.dtype))[..., None]
        return y + jnp.einsum("...nr,nro->...o", xa, b)
    return y + jnp.einsum("...nr,n,nro->...o", xa, g, b)


def make_lora(
    base: Linear,
    a: jax.Array,  # [n, in, r]
    b: jax.Array,  # [n, r, out]
    scale: jax.Array,  # [n] alpha/r per adapter
    gates: jax.Array | None = None,  # [n] activation mask
) -> Linear:
    n = a.shape[0]
    if gates is None:
        gates = jnp.ones((n,), jnp.float32)
    return Linear(
        kind="lora",
        shape=base.shape,
        data={"base": base, "a": a, "b": b,
              "scale": jnp.asarray(scale, jnp.float32),
              "gates": jnp.asarray(gates, jnp.float32)},
    )


def _wrap_layer_dict(
    layer: dict, layer_idx: int, adapters: list[LoraAdapter], dtype
) -> dict:
    """Wrap every targeted Linear in one (unstacked) layer param dict."""
    out = jax.tree.map(lambda x: x, layer)  # shallow structural copy
    for tgt, path in TARGET_KEYS.items():
        hits = [ad.weights.get(f"{layer_idx}.{tgt}") for ad in adapters]
        if not any(h is not None for h in hits):
            continue
        node = out
        for k in path[:-1]:
            node = node.get(k) if isinstance(node, dict) else None
            if node is None:
                break
        if node is None or path[-1] not in node:
            continue
        base: Linear = node[path[-1]]
        if base.kind == "lora":
            continue
        in_f, out_f = base.shape
        a_stack, b_stack, scale = [], [], []
        for ad, w in zip(adapters, hits):
            if w is None:
                # adapter doesn't target this layer/proj: zero contribution
                a_stack.append(np.zeros((in_f, max(ad.r, 1)), np.float32))
                b_stack.append(np.zeros((max(ad.r, 1), out_f), np.float32))
                scale.append(0.0)
            else:
                A, B = w  # A [r, in], B [out, r] torch layout
                a_stack.append(np.ascontiguousarray(A.T.astype(np.float32)))
                b_stack.append(np.ascontiguousarray(B.T.astype(np.float32)))
                scale.append(ad.scale)
        rmax = max(x.shape[1] for x in a_stack)
        a_stack = [np.pad(x, ((0, 0), (0, rmax - x.shape[1]))) for x in a_stack]
        b_stack = [np.pad(x, ((0, rmax - x.shape[0]), (0, 0))) for x in b_stack]
        node[path[-1]] = make_lora(
            base,
            jnp.asarray(np.stack(a_stack), dtype),
            jnp.asarray(np.stack(b_stack), dtype),
            np.asarray(scale, np.float32),
        )
    return out


def apply_lora_to_params(params, cfg, adapters: list[LoraAdapter], dtype=jnp.float32):
    """Wrap targeted projections of a (stacked) DecoderParams with the given
    adapters. Returns new DecoderParams; every wrapped Linear carries all
    adapters, gated by the activation vector.

    Works by un-stacking each scan group, wrapping per layer, and re-grouping
    (adapters that skip layers produce zero-padded slots, keeping the scan
    structure uniform). Ref: lora/mod.rs ordering-driven layer wrapping.
    """
    from mistralrs_tpu.models.loader import group_layers

    layers = unstack_groups(params)
    wrapped = [
        _wrap_layer_dict(lp, i, adapters, dtype) for i, lp in enumerate(layers)
    ]
    groups, sizes = group_layers(wrapped)
    return dataclasses.replace(params, layer_groups=groups, group_sizes=sizes)


def unstack_groups(params) -> list[dict]:
    """Inverse of group_layers: per-layer param dicts from stacked groups."""
    layers: list[dict] = []
    for gparams, size in zip(params.layer_groups, params.group_sizes):
        for j in range(size):
            layers.append(jax.tree.map(lambda x, j=j: x[j], gparams))
    return layers


def adapter_names(adapters: list[LoraAdapter]) -> list[str]:
    return [a.name for a in adapters]


def activate_adapters(params, names: list[str], active: list[str]):
    """Return params with the gates vector set to 1.0 for `active` adapters,
    0.0 otherwise — a data-only update, no recompilation (ref
    AdapterSwapper::activate_adapters lora/mod.rs:120-131)."""
    unknown = set(active) - set(names)
    if unknown:
        raise ValueError(f"unknown adapters: {sorted(unknown)} (have {names})")
    mask = np.asarray([1.0 if n in active else 0.0 for n in names], np.float32)

    def visit(node):
        if isinstance(node, Linear) and node.kind == "lora":
            data = dict(node.data)
            # gates are [n] per layer, [L, n] in stacked scan groups
            data["gates"] = jnp.broadcast_to(jnp.asarray(mask), data["gates"].shape)
            return Linear(kind=node.kind, shape=node.shape, data=data, meta=node.meta)
        return node

    return jax.tree.map(visit, params, is_leaf=lambda x: isinstance(x, Linear))


def merge_lora(params):
    """Fold active adapters into dense base weights and drop the wrappers
    (ref Merge::merge_weights). Quantized bases stay unmerged (the reference's
    QLoraLinear likewise computes adapters unmerged at runtime)."""

    def visit(node):
        if isinstance(node, Linear) and node.kind == "lora":
            base: Linear = node.data["base"]
            if base.kind != "dense":
                return node
            g = node.data["gates"] * node.data["scale"]  # [n] or [L, n]
            a, b = node.data["a"], node.data["b"]
            delta = jnp.einsum("...nir,...nro,...n->...io", a, b, g.astype(a.dtype))
            w = base.data["w"] + delta.astype(base.data["w"].dtype)
            return make_dense(w, base.data.get("b"))
        return node

    return jax.tree.map(visit, params, is_leaf=lambda x: isinstance(x, Linear))
