"""Vision transformer encoder (CLIP / SigLIP variants), scanned.

Reference parity: mistralrs-core/src/vision_models/clip.rs (CLIP vision
tower used by llava/llava-next/phi3v) and idefics2's SigLIP-style encoder
(idefics2.rs vision section). One config-driven encoder covers both:
- CLIP:   patch conv (no bias) + class token + learned pos embed +
          pre-layernorm, quick_gelu MLP, post-layernorm.
- SigLIP: patch conv (bias), no class token, gelu_tanh MLP, post-layernorm.

TPU design mirrors models/decoder.py: layers stacked on a leading [L] axis
and run under `lax.scan`; per-layer hidden states come back as scan ys so
feature taps like llava's `vision_feature_layer=-2` are free. The patch
"conv" (stride == kernel, no padding) is computed as an unfold + one big
matmul — MXU-shaped, no conv lowering needed.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mistralrs_tpu.ops import layers as L


@struct.dataclass
class VisionConfig:
    hidden_size: int = struct.field(pytree_node=False)
    intermediate_size: int = struct.field(pytree_node=False)
    num_layers: int = struct.field(pytree_node=False)
    num_heads: int = struct.field(pytree_node=False)
    image_size: int = struct.field(pytree_node=False)
    patch_size: int = struct.field(pytree_node=False)
    act: str = struct.field(pytree_node=False, default="quick_gelu")
    norm_eps: float = struct.field(pytree_node=False, default=1e-5)
    use_class_token: bool = struct.field(pytree_node=False, default=True)
    use_pre_norm: bool = struct.field(pytree_node=False, default=True)
    # CLIP post-layernorms only the pooled CLS; SigLIP norms the whole
    # last_hidden_state
    post_norm_last: bool = struct.field(pytree_node=False, default=False)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def from_hf(cls, d: dict[str, Any], siglip: bool = False) -> "VisionConfig":
        return cls(
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d.get("num_hidden_layers", 12),
            num_heads=d["num_attention_heads"],
            image_size=d.get("image_size", 224),
            patch_size=d.get("patch_size", 14),
            act={"quick_gelu": "quick_gelu", "gelu": "gelu",
                 "gelu_pytorch_tanh": "gelu_tanh"}.get(d.get("hidden_act", "quick_gelu"),
                                                       "quick_gelu"),
            norm_eps=d.get("layer_norm_eps", 1e-6 if siglip else 1e-5),
            use_class_token=not siglip,
            use_pre_norm=not siglip,
            post_norm_last=siglip,
        )


@struct.dataclass
class VisionParams:
    patch_w: jax.Array  # [3*p*p, E] (unfold layout)
    patch_b: jax.Array | None
    pos_embed: jax.Array  # [n_pos, E]
    cls_embed: jax.Array | None  # [E]
    pre_norm: dict | None
    layers: dict  # stacked [L, ...]: q,k,v,o,fc1,fc2 (w/b), ln1, ln2
    post_norm: dict | None


def _ln(p: dict, x: jax.Array, eps: float) -> jax.Array:
    return L.layer_norm(x, p["w"], p.get("b"), eps)


def _patchify(pixel_values: jax.Array, patch: int) -> jax.Array:
    """[B, 3, H, W] -> [B, nH*nW, 3*p*p] (channel-major per patch, matching
    torch conv weight layout [E, 3, p, p].reshape(E, -1))."""
    B, C, H, W = pixel_values.shape
    nh, nw = H // patch, W // patch
    x = pixel_values.reshape(B, C, nh, patch, nw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, nh, nw, C, p, p]
    return x.reshape(B, nh * nw, C * patch * patch)


def vit_forward(
    params: VisionParams,
    cfg: VisionConfig,
    pixel_values: jax.Array,  # [B, 3, H, W]
    patch_attention_mask: jax.Array | None = None,  # [B, n_patches] (siglip pad)
) -> tuple[jax.Array, jax.Array]:
    """Returns (final_hidden [B, T, E] post-norm'd, per_layer [L, B, T, E]
    pre-final-norm hidden states after each block)."""
    dtype = params.patch_w.dtype
    x = _patchify(pixel_values.astype(dtype), cfg.patch_size)  # [B, N, 3pp]
    h = jnp.dot(x, params.patch_w)
    if params.patch_b is not None:
        h = h + params.patch_b
    B, N, E = h.shape
    if cfg.use_class_token and params.cls_embed is not None:
        cls = jnp.broadcast_to(params.cls_embed[None, None], (B, 1, E)).astype(h.dtype)
        h = jnp.concatenate([cls, h], axis=1)
    n_tok = h.shape[1]
    h = h + params.pos_embed[:n_tok].astype(h.dtype)
    if params.pre_norm is not None:
        h = _ln(params.pre_norm, h, cfg.norm_eps)

    bias = None
    if patch_attention_mask is not None:
        pad = jnp.where(patch_attention_mask.astype(bool), 0.0, -1e9)  # [B, N]
        bias = pad[:, None, None, :]  # [B, 1, 1, N]

    act = L.ACTIVATIONS[cfg.act]
    Hh, D = cfg.num_heads, cfg.head_dim
    scale = D**-0.5

    def block(h, lp):
        x = _ln(lp["ln1"], h, cfg.norm_eps)
        q = (jnp.dot(x, lp["q"]["w"]) + lp["q"]["b"]).reshape(B, n_tok, Hh, D)
        k = (jnp.dot(x, lp["k"]["w"]) + lp["k"]["b"]).reshape(B, n_tok, Hh, D)
        v = (jnp.dot(x, lp["v"]["w"]) + lp["v"]["b"]).reshape(B, n_tok, Hh, D)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if bias is not None:
            attn = attn + bias
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(h.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, n_tok, E)
        h = h + jnp.dot(o, lp["o"]["w"]) + lp["o"]["b"]
        x = _ln(lp["ln2"], h, cfg.norm_eps)
        x = act(jnp.dot(x, lp["fc1"]["w"]) + lp["fc1"]["b"])
        h = h + jnp.dot(x, lp["fc2"]["w"]) + lp["fc2"]["b"]
        return h, h

    h, per_layer = jax.lax.scan(block, h, params.layers)
    final = h
    if cfg.post_norm_last and params.post_norm is not None:
        final = _ln(params.post_norm, final, cfg.norm_eps)
    return final, per_layer


# ------------------------------------------------------------------- loading
def vision_params_from_hf(
    get, prefix: str, cfg: VisionConfig, dtype=jnp.float32
) -> VisionParams:
    """Load from HF CLIP/SigLIP vision-model tensors under `prefix`
    (e.g. "vision_tower.vision_model."). `get(name) -> np.ndarray | None`."""

    def t(name, transpose=False):
        a = get(prefix + name)
        if a is None:
            return None
        a = np.ascontiguousarray(a.T) if transpose else a
        return jnp.asarray(a, dtype)

    def lin(name):
        return {"w": t(name + ".weight", transpose=True), "b": t(name + ".bias")}

    def norm(name):
        d = {"w": t(name + ".weight")}
        b = t(name + ".bias")
        if b is not None:
            d["b"] = b
        return d

    pw = get(prefix + "embeddings.patch_embedding.weight")  # [E, 3, p, p]
    E = pw.shape[0]
    patch_w = jnp.asarray(np.ascontiguousarray(pw.reshape(E, -1).T), dtype)
    patch_b = t("embeddings.patch_embedding.bias")
    cls = t("embeddings.class_embedding")
    pos = t("embeddings.position_embedding.weight")
    pre = None
    for cand in ("pre_layrnorm", "pre_layernorm"):  # the CLIP typo is real
        if get(prefix + cand + ".weight") is not None:
            pre = norm(cand)
            break
    layers = []
    for i in range(cfg.num_layers):
        lp = f"encoder.layers.{i}."
        layers.append({
            "q": lin(lp + "self_attn.q_proj"),
            "k": lin(lp + "self_attn.k_proj"),
            "v": lin(lp + "self_attn.v_proj"),
            "o": lin(lp + "self_attn.out_proj"),
            "ln1": norm(lp + "layer_norm1"),
            "ln2": norm(lp + "layer_norm2"),
            "fc1": lin(lp + "mlp.fc1"),
            "fc2": lin(lp + "mlp.fc2"),
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    post = None
    if get(prefix + "post_layernorm.weight") is not None:
        post = norm("post_layernorm")
    return VisionParams(
        patch_w=patch_w, patch_b=patch_b, pos_embed=pos, cls_embed=cls,
        pre_norm=pre, layers=stacked, post_norm=post,
    )
