"""Phi-3-Vision: CLIP-L/14-336 tower + HD transform + phi3 text model.

Reference parity: mistralrs-core/src/vision_models/phi3.rs
(`ImageEmbedding::forward` :642-800 — HD transform with glb_GN/sub_GN
separators, 2x2 feature pooling into 4C channels, `get_image_features`
:627-640 with layer_idx/type_feature) and phi3_inputs_processor.rs
(`hd_transform` :390-423 resize/pad-to-336-grid, crop splitting + global
image, `num_img_tokens = (h/336*w/336+1)*144 + (h/336+1)*12 + 1`).

One deviation: the reference marks image spans with negative input ids;
our VisionPipeline splices features at a positive placeholder id expanded
`num_img_tokens` times (same positions, same features).
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
from PIL import Image

from mistralrs_tpu.vision import transforms as T
from mistralrs_tpu.vision.vit import VisionConfig, VisionParams, vision_params_from_hf, vit_forward

CLIP_L_336 = dict(
    hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
    num_attention_heads=16, image_size=336, patch_size=14,
    hidden_act="quick_gelu", layer_norm_eps=1e-5,
)


@struct.dataclass
class Phi3VVision:
    vcfg: VisionConfig
    vparams: VisionParams
    glb_gn: jax.Array  # [1, 1, 4C]
    sub_gn: jax.Array  # [1, 1, 1, 4C]
    proj1: dict  # Linear 4C -> E {w, b}
    proj2: dict  # Linear E -> E {w, b}
    layer_idx: int = struct.field(pytree_node=False, default=-2)
    type_feature: str = struct.field(pytree_node=False, default="patch")
    hd_order: str = struct.field(pytree_node=False, default="sub_glb")


def get_image_features(v: Phi3VVision, pixel_values: jax.Array) -> jax.Array:
    """[n_crops, 3, 336, 336] -> [n_crops, 576, C] (ref get_image_features)."""
    _, per_layer = vit_forward(v.vparams, v.vcfg, pixel_values)
    L = per_layer.shape[0]
    j = v.layer_idx if v.layer_idx >= 0 else L + 1 + v.layer_idx
    feats = per_layer[j - 1]
    if v.type_feature == "patch":
        feats = feats[:, 1:]
    return feats


def _pool_2x2(x: jax.Array) -> jax.Array:
    """[N, H, H, C] -> [N, H/2, H/2, 4C] (2x2 neighborhood concat)."""
    N, H, _, C = x.shape
    x = x.reshape(N, H // 2, 2, H // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(N, H // 2, H // 2, 4 * C)


def hd_feature_transform(
    v: Phi3VVision, feats: jax.Array, image_hw: tuple[int, int]
) -> jax.Array:
    """feats [1+h*w(+pad), 576, C] (global first) -> [num_img_tokens, E]
    (ref phi3.rs :668-775)."""
    H = int(math.isqrt(feats.shape[1]))  # 24
    C = feats.shape[-1]
    h = image_hw[0] // 336
    w = image_hw[1] // 336

    glb = _pool_2x2(feats[:1].reshape(1, H, H, C))  # [1, 12, 12, 4C]
    nl = jnp.broadcast_to(v.sub_gn.astype(glb.dtype), (1, H // 2, 1, 4 * C))
    glb = jnp.concatenate([glb, nl], axis=2).reshape(1, -1, 4 * C)  # [1, 12*13, 4C]

    sub = feats[1 : 1 + h * w]
    sub = _pool_2x2(sub.reshape(h * w, H, H, C))  # [hw, 12, 12, 4C]
    sub = sub.reshape(1, h, w, H // 2, H // 2, 4 * C)
    sub = sub.transpose(0, 1, 3, 2, 4, 5).reshape(1, h * (H // 2), w * (H // 2), 4 * C)
    nl = jnp.broadcast_to(v.sub_gn.astype(sub.dtype), (1, h * (H // 2), 1, 4 * C))
    sub = jnp.concatenate([sub, nl], axis=2).reshape(1, -1, 4 * C)

    gn = v.glb_gn.astype(glb.dtype)
    if v.hd_order == "glb_sub":
        out = jnp.concatenate([glb, gn, sub], axis=1)
    else:  # sub_glb (the published phi3-v config)
        out = jnp.concatenate([sub, gn, glb], axis=1)
    # img_projection: Linear -> GELU -> Linear (ref mlp projection_cls)
    x = jnp.dot(out[0], v.proj1["w"]) + v.proj1["b"]
    x = jax.nn.gelu(x, approximate=False)
    return jnp.dot(x, v.proj2["w"]) + v.proj2["b"]


def num_img_tokens(image_hw: tuple[int, int]) -> int:
    h, w = image_hw[0] // 336, image_hw[1] // 336
    return (h * w + 1) * 144 + (h + 1) * 12 + 1


def make_phi3v_encoder(v: Phi3VVision):
    feats_fn = jax.jit(lambda px: get_image_features(v, px))

    def encode(seq):
        outs = []
        for im in seq.images:
            px = np.asarray(im["pixel_values"], np.float32)  # [n_crops, 3, 336, 336]
            f = feats_fn(jnp.asarray(px))
            outs.append(hd_feature_transform(v, f, im["orig_hw"]))
        return jnp.concatenate(outs, axis=0)

    return encode


# -------------------------------------------------------------- processor
class Phi3VProcessor:
    """HD-transform image preprocessing + <|image|> expansion
    (ref phi3_inputs_processor.rs)."""

    MEAN = (0.48145466, 0.4578275, 0.40821073)
    STD = (0.26862954, 0.26130258, 0.27577711)

    def __init__(self, tokenizer, image_token_id: int, num_crops: int = 16,
                 image_token: str = "<|image|>"):
        self.tok = tokenizer
        self.image_token = image_token
        self.image_token_id = image_token_id
        self.num_crops = num_crops

    def _hd_resize(self, img: Image.Image) -> Image.Image:
        """Scale so crops <= num_crops, pad height to a 336 multiple
        (ref hd_transform :390 + padding_336 :374)."""
        transposed = False
        if img.width < img.height:
            img = img.transpose(Image.Transpose.ROTATE_90)
            transposed = True
        ratio = img.width / img.height
        scale = 1.0
        while scale * math.ceil(scale / ratio) <= self.num_crops:
            scale += 1.0
        scale -= 1.0
        new_w = int(scale * 336)
        new_h = int(new_w / ratio)
        img = img.resize((new_w, new_h), Image.Resampling.NEAREST)
        tar = int(math.ceil(img.height / 336) * 336)
        top = (tar - img.height + 1) // 2
        canvas = Image.new("RGB", (img.width, tar), (255, 255, 255))
        canvas.paste(img, (0, top))
        if transposed:
            canvas = canvas.transpose(Image.Transpose.ROTATE_270)
        return canvas

    def preprocess_image(self, img: Image.Image) -> dict:
        hd = self._hd_resize(img.convert("RGB"))
        x = T.normalize(T.to_tensor(hd), self.MEAN, self.STD)  # [3, H, W]
        _, Hh, Ww = x.shape
        # global 336x336 (bicubic on the normalized tensor, like interpolate2d)
        import jax.image

        glb = np.asarray(jax.image.resize(jnp.asarray(x), (3, 336, 336), "bicubic"))
        h, w = Hh // 336, Ww // 336
        crops = x.reshape(3, h, 336, w, 336).transpose(1, 3, 0, 2, 4).reshape(-1, 3, 336, 336)
        px = np.concatenate([glb[None], crops], axis=0)
        return {"pixel_values": px.astype(np.float32), "orig_hw": (Hh, Ww)}

    def __call__(self, text: str, images: list) -> tuple[list[int], list[dict]]:
        from mistralrs_tpu.vision.processor import decode_image

        pixel = [self.preprocess_image(decode_image(im)) for im in images]
        parts = text.split(self.image_token)
        if len(parts) - 1 != len(images):
            raise ValueError("image count mismatch")
        ids: list[int] = self.tok.encode(parts[0])
        for i, part in enumerate(parts[1:]):
            ids.extend([self.image_token_id] * num_img_tokens(pixel[i]["orig_hw"]))
            ids.extend(self.tok.encode(part, add_special_tokens=False))
        return ids, pixel


# ----------------------------------------------------------------- loading
def load_phi3v(path: str, dtype=jnp.float32):
    """Load an HF Phi-3-vision checkpoint dir. Returns
    (text_cfg, text_params, rope, Phi3VVision, hf_config)."""
    from safetensors import safe_open

    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source

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

    emb_cfg = hf.get("embd_layer", {}) or {}
    img_cfg = hf.get("img_processor", {}) or {}
    vp = "model.vision_embed_tokens."
    vcfg = VisionConfig.from_hf({**CLIP_L_336, **img_cfg.get("vision_config", {})})
    vparams = vision_params_from_hf(get, vp + "img_processor.vision_model.", vcfg, dtype)

    def lin(name):
        return {
            "w": jnp.asarray(np.ascontiguousarray(get(name + ".weight").T), dtype),
            "b": jnp.asarray(get(name + ".bias"), dtype),
        }

    vision = Phi3VVision(
        vcfg=vcfg,
        vparams=vparams,
        glb_gn=jnp.asarray(get(vp + "glb_GN"), dtype),
        sub_gn=jnp.asarray(get(vp + "sub_GN"), dtype),
        proj1=lin(vp + "img_projection.0"),
        proj2=lin(vp + "img_projection.2"),
        layer_idx=img_cfg.get("layer_idx", -2),
        type_feature=img_cfg.get("type_feature", "patch"),
        hd_order=emb_cfg.get("hd_transform_order", "sub_glb"),
    )
    tcfg_d = dict(hf)
    tcfg_d["architectures"] = ["Phi3ForCausalLM"]
    text_cfg = config_from_hf(tcfg_d)
    params = params_from_source(
        text_cfg, TensorSource(lambda n: get(n), set(where)), dtype
    )
    return text_cfg, params, make_rope(text_cfg), vision, hf
