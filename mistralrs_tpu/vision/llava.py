"""LLaVA and LLaVA-Next vision-language models.

Reference parity: mistralrs-core/src/vision_models/{llava/llava15.rs,
llava/llava_next.rs, llava/llava_llm/*} — CLIP vision tower -> MLP projector
-> token-spliced language model; llava-next adds anyres tiling with
image_newline separators and spatial unpadding.

The language side reuses the unified decoder (models/decoder.py); this
module owns the vision tower + projector and the feature packing that turns
pixel values into per-image-token embedding rows.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mistralrs_tpu.vision.vit import (
    VisionConfig,
    VisionParams,
    vision_params_from_hf,
    vit_forward,
)


@struct.dataclass
class LlavaVision:
    """Vision tower + projector parameters and static knobs."""

    vcfg: VisionConfig
    vparams: VisionParams
    proj1: dict  # linear_1 {w, b}
    proj2: dict  # linear_2 {w, b}
    feature_layer: int = struct.field(pytree_node=False, default=-2)
    select: str = struct.field(pytree_node=False, default="default")
    image_newline: jax.Array | None = None  # [E_text] (llava-next)
    grid_pinpoints: tuple = struct.field(pytree_node=False, default=())
    proj_act: str = struct.field(pytree_node=False, default="gelu")


def image_features(vision: LlavaVision, pixel_values: jax.Array) -> jax.Array:
    """[N, 3, H, W] -> projected features [N, n_patches, E_text]
    (ref llava15.rs encode_images)."""
    from mistralrs_tpu.ops.layers import ACTIVATIONS

    _, per_layer = vit_forward(vision.vparams, vision.vcfg, pixel_values)
    # HF hidden_states[j] (j>=1) == per_layer[j-1]; [0] is the embeddings
    L = per_layer.shape[0]
    j = vision.feature_layer if vision.feature_layer >= 0 else L + 1 + vision.feature_layer
    feats = per_layer[j - 1]  # [N, T, E_vis]
    if vision.select == "default":
        feats = feats[:, 1:]  # drop CLS (ref feature select "default")
    act = ACTIVATIONS[vision.proj_act]
    h = jnp.dot(feats, vision.proj1["w"]) + vision.proj1["b"]
    h = act(h)
    return jnp.dot(h, vision.proj2["w"]) + vision.proj2["b"]


# ------------------------------------------------------------- llava-next
def select_best_resolution(orig_hw: tuple[int, int], pinpoints) -> tuple[int, int]:
    """Pick the grid resolution that best fits the image (HF/llava-next
    algorithm; ref llava_next.rs get_anyres_image_grid_shape)."""
    oh, ow = orig_hw
    best, best_fit = None, None
    for h, w in pinpoints:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        effective = min(dw * dh, ow * oh)
        wasted = w * h - effective
        fit = (effective, -wasted)
        if best_fit is None or fit > best_fit:
            best_fit, best = fit, (h, w)
    return best


def anyres_grid_shape(orig_hw, pinpoints, patch_img_size) -> tuple[int, int]:
    h, w = select_best_resolution(orig_hw, pinpoints)
    return h // patch_img_size, w // patch_img_size


def unpad_image(tensor: jax.Array, orig_hw: tuple[int, int]) -> jax.Array:
    """Remove padding added by resize-with-aspect (HF unpad_image).
    tensor: [E, H, W]."""
    oh, ow = orig_hw
    _, ch, cw = tensor.shape
    ratio_w, ratio_h = cw / ow, ch / oh
    if ratio_w < ratio_h:
        new_h = int(round(oh * ratio_w, 7))
        pad = (ch - new_h) // 2
        return tensor[:, pad : ch - pad, :]
    new_w = int(round(ow * ratio_h, 7))
    pad = (cw - new_w) // 2
    return tensor[:, :, pad : cw - pad]


def pack_llava_next_features(
    vision: LlavaVision,
    feats: jax.Array,  # [n_tiles, n_patches, E] projected tile features
    orig_hw: tuple[int, int],
) -> jax.Array:
    """Base tile + unpadded spatial grid + image_newline columns -> [T, E]
    (HF pack_image_features; ref llava_next.rs)."""
    side = vision.vcfg.image_size // vision.vcfg.patch_size
    base = feats[0]  # [side*side, E]
    rest = feats[1:]
    if rest.shape[0] == 0:
        return base
    gh, gw = anyres_grid_shape(orig_hw, vision.grid_pinpoints, vision.vcfg.image_size)
    E = feats.shape[-1]
    grid = rest.reshape(gh, gw, side, side, E)
    grid = grid.transpose(4, 0, 2, 1, 3).reshape(E, gh * side, gw * side)
    grid = unpad_image(grid, orig_hw)
    if vision.image_newline is not None:
        nl = jnp.broadcast_to(
            vision.image_newline[:, None, None].astype(grid.dtype),
            (E, grid.shape[1], 1),
        )
        grid = jnp.concatenate([grid, nl], axis=2)
    spatial = grid.reshape(E, -1).T  # [h*(w+1), E]
    return jnp.concatenate([base, spatial], axis=0)


def make_llava_encoder(vision: LlavaVision, llava_next: bool = False):
    """encode_images(seq) callback for VisionPipeline. Each seq.images entry:
    {"pixel_values": [3,H,W] or [n_tiles,3,H,W], "orig_hw": (h, w)}."""
    feats_fn = jax.jit(lambda px: image_features(vision, px))

    def encode(seq):
        outs = []
        for im in seq.images:
            px = np.asarray(im["pixel_values"], np.float32)
            if px.ndim == 3:
                px = px[None]
            f = feats_fn(jnp.asarray(px))  # [n_tiles, P, E]
            if llava_next:
                outs.append(pack_llava_next_features(vision, f, im["orig_hw"]))
            else:
                outs.append(f.reshape(-1, f.shape[-1]))
        return jnp.concatenate(outs, axis=0)

    return encode


# ------------------------------------------------------------------ loading
def llava_vision_from_get(get, hf: dict, dtype=jnp.float32) -> LlavaVision:
    """Build LlavaVision from a tensor getter. Handles both HF key layouts:
    new (model.vision_tower..., model.language_model...) and legacy
    (vision_tower..., language_model.model...)."""
    base = "model." if get("model.multi_modal_projector.linear_1.weight") is not None else ""
    vcfg = VisionConfig.from_hf(hf["vision_config"])
    vparams = vision_params_from_hf(get, base + "vision_tower.vision_model.", vcfg, dtype)

    def lin(name):
        return {
            "w": jnp.asarray(np.ascontiguousarray(get(name + ".weight").T), dtype),
            "b": jnp.asarray(get(name + ".bias"), dtype),
        }

    newline = get(base + "image_newline")
    return LlavaVision(
        vcfg=vcfg,
        vparams=vparams,
        proj1=lin(base + "multi_modal_projector.linear_1"),
        proj2=lin(base + "multi_modal_projector.linear_2"),
        feature_layer=hf.get("vision_feature_layer", -2),
        select=hf.get("vision_feature_select_strategy", "default"),
        image_newline=None if newline is None else jnp.asarray(newline, dtype),
        grid_pinpoints=tuple(map(tuple, hf.get("image_grid_pinpoints", ()) or ())),
        proj_act=hf.get("projector_hidden_act", "gelu"),
    )


def llava_text_source(get, names: set[str]):
    """TensorSource presenting the llava language model under the plain
    text-model names (model.layers.* / lm_head) our loader expects."""
    from mistralrs_tpu.models.loader import TensorSource

    mapped = {}
    for n in names:
        if n.startswith("model.language_model."):
            mapped["model." + n[len("model.language_model."):]] = n
        elif n.startswith("language_model.model."):
            mapped["model." + n[len("language_model.model."):]] = n
        elif n.startswith("language_model.lm_head."):
            mapped["lm_head." + n[len("language_model.lm_head."):]] = n
        elif n == "lm_head.weight":
            mapped[n] = n
    return TensorSource(lambda n: get(mapped[n]), set(mapped))


def load_llava(path: str, dtype=jnp.float32):
    """Load a full llava / llava-next checkpoint dir.

    Returns (text_cfg, text_params, rope, vision: LlavaVision, hf_config)."""
    from safetensors import safe_open

    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import make_rope, params_from_source

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".safetensors")
    )
    where: dict[str, Any] = {}
    for fpath in files:
        h = safe_open(fpath, framework="np")
        for name in h.keys():
            where[name] = h

    def get(name):
        h = where.get(name)
        return None if h is None else h.get_tensor(name)

    vision = llava_vision_from_get(get, hf, dtype)
    tcfg_dict = dict(hf["text_config"])
    tcfg_dict.setdefault("architectures", ["LlamaForCausalLM"])
    text_cfg = config_from_hf(tcfg_dict)
    src = llava_text_source(get, set(where))
    params = params_from_source(text_cfg, src, dtype)
    return text_cfg, params, make_rope(text_cfg), vision, hf
