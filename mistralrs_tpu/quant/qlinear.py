"""`Linear`: the polymorphic (possibly quantized) linear layer.

Reference parity: mistralrs-quant/src/lib.rs `QuantMethod` trait (:139-174) and
`UnquantLinear`. Quantized kinds register a forward via `register_kind`; each
kind's arrays live in `data` (dynamic pytree leaves) while `kind`/`shape` are
static, so jit specializes per kind with no runtime dispatch.

Weight convention: logical shape is (in_features, out_features) and forward is
``y = x @ W (+ b)`` — the transpose of torch's (out, in). HF/torch checkpoints
are transposed at load time. This keeps sharding specs readable
(PartitionSpec(None, "tp") = column-parallel).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Linear:
    kind: str = struct.field(pytree_node=False)
    shape: tuple[int, int] = struct.field(pytree_node=False)  # (in, out)
    data: dict[str, Any] = struct.field(default_factory=dict)
    # static per-kind layout constants (e.g. q6k chunk span); hashable dict
    meta: Any = struct.field(pytree_node=False, default=None)

    @property
    def in_features(self) -> int:
        return self.shape[0]

    @property
    def out_features(self) -> int:
        return self.shape[1]


_FORWARDS: dict[str, Callable[[Linear, jax.Array], jax.Array]] = {}

# kinds whose TPU forwards consume STACKED [L, ...] data + a traced layer
# index ("lidx" data leaf) directly via scalar-prefetch kernels — see
# ops/quant_matmul.py stacked-layer section; populated at its import
STACKED_OK: set[str] = set()


def unstack_layer(lin: Linear) -> Linear:
    """Resolve a stacked-layer Linear (data leaves [L, ...] + traced
    "lidx") into that layer's plain Linear via dynamic indexing — the
    generic fallback for kinds without a stacked kernel (costs the layer
    copy the stacked path exists to avoid, identical to the pre-r4 scan
    xs slicing)."""
    lidx = lin.data["lidx"]
    rest = {k: v for k, v in lin.data.items() if k != "lidx"}
    # tree.map recurses into nested Linears (lora wrappers hold a "base"
    # Linear inside data)
    data = jax.tree.map(lambda v: jnp.take(v, lidx, axis=0), rest)
    return Linear(kind=lin.kind, shape=lin.shape, data=data, meta=lin.meta)


def register_kind(kind: str):
    def deco(fn):
        _FORWARDS[kind] = fn
        return fn

    return deco


def _ensure_kind(kind: str) -> None:
    """Import the module that registers `kind` (kinds register at import;
    a Linear can be constructed before its forward module was imported)."""
    import importlib

    mod = None
    if kind.startswith("gguf_"):
        mod = "mistralrs_tpu.quant.gguf_linear"
    elif kind.startswith("gptq_"):
        mod = "mistralrs_tpu.quant.gptq"
    elif kind.startswith("hqq_"):
        mod = "mistralrs_tpu.quant.hqq"
    elif kind == "lora":
        mod = "mistralrs_tpu.lora.lora"
    if mod is not None:
        importlib.import_module(mod)


def linear(lin: Linear, x: jax.Array, lora_scales: jax.Array | None = None) -> jax.Array:
    """y = x @ W (+b). x: [..., in] -> [..., out].

    lora_scales: optional per-token adapter scalings [..., n_adapters]
    (X-LoRA); only the "lora" kind consumes them."""
    if lin.kind not in _FORWARDS:
        _ensure_kind(lin.kind)
    if "lidx" in lin.data and lin.kind not in STACKED_OK:
        lin = unstack_layer(lin)
    in_perm = lin.data.get("in_perm")
    if in_perm is not None:
        # load-time row reorder (GPTQ act-order): gather the matching input
        # permutation — an [in]-sized gather instead of an [in,out] one
        x = jnp.take(x, in_perm, axis=-1)
    if lin.kind == "lora":
        return _FORWARDS["lora"](lin, x, lora_scales)
    return _FORWARDS[lin.kind](lin, x)


@register_kind("dense")
def _dense_forward(lin: Linear, x: jax.Array) -> jax.Array:
    w = lin.data["w"]
    y = jnp.dot(x, w.astype(x.dtype))
    b = lin.data.get("b")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def make_dense(w: jax.Array, b: jax.Array | None = None) -> Linear:
    """w: (in, out)."""
    data = {"w": w}
    if b is not None:
        data["b"] = b
    return Linear(kind="dense", shape=(int(w.shape[0]), int(w.shape[1])), data=data)


def bias_of(lin: Linear) -> jax.Array | None:
    return lin.data.get("b")
