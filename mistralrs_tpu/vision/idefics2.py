"""Idefics2: SigLIP vision encoder + perceiver-resampler connector.

Reference parity: mistralrs-core/src/vision_models/idefics2.rs — SigLIP-ish
encoder, `Idefics2Connector` (gated modality-projection MLP + perceiver
resampler compressing each image to n_latents tokens), features spliced at
image-token positions of the mistral-based text model.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mistralrs_tpu.ops import layers as L
from mistralrs_tpu.vision.vit import VisionConfig, VisionParams, vision_params_from_hf, vit_forward


@struct.dataclass
class Idefics2Vision:
    vcfg: VisionConfig
    vparams: VisionParams
    proj: dict  # modality_projection {gate, up, down} (no bias)
    latents: jax.Array  # [n_latents, E_text]
    layers: dict  # stacked perceiver layers
    final_norm: jax.Array  # rms weight
    n_heads: int = struct.field(pytree_node=False)
    n_kv_heads: int = struct.field(pytree_node=False)
    head_dim: int = struct.field(pytree_node=False)
    rms_eps: float = struct.field(pytree_node=False, default=1e-6)
    act: str = struct.field(pytree_node=False, default="silu")


def _rms(w: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    return L.rms_norm(x, w, eps)


def _mlp(p: dict, x: jax.Array, act) -> jax.Array:
    return jnp.dot(act(jnp.dot(x, p["gate"])) * jnp.dot(x, p["up"]), p["down"])


def connector_forward(v: Idefics2Vision, image_hidden: jax.Array) -> jax.Array:
    """[N, T, E_vis] -> [N, n_latents, E_text] (ref Idefics2Connector)."""
    act = L.ACTIVATIONS[v.act]
    ctx = _mlp(v.proj, image_hidden, act)  # [N, T, E_text]
    N = ctx.shape[0]
    lat = jnp.broadcast_to(v.latents[None], (N, *v.latents.shape)).astype(ctx.dtype)
    H, Hkv, D = v.n_heads, v.n_kv_heads, v.head_dim
    scale = D**-0.5
    nl = lat.shape[1]

    def layer(lat, lp):
        x = _rms(lp["ln_lat"], lat, v.rms_eps)
        c = _rms(lp["ln_ctx"], ctx, v.rms_eps)
        kv_in = jnp.concatenate([c, x], axis=1)  # [N, T+nl, E]
        q = jnp.dot(x, lp["q"]).reshape(N, nl, H, D)
        k = jnp.dot(kv_in, lp["k"]).reshape(N, -1, Hkv, D)
        vv = jnp.dot(kv_in, lp["v"]).reshape(N, -1, Hkv, D)
        if Hkv != H:
            rep = H // Hkv
            k = jnp.repeat(k, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(lat.dtype)
        o = jnp.einsum("nhqk,nkhd->nqhd", attn, vv).reshape(N, nl, H * D)
        lat = lat + jnp.dot(o, lp["o"])
        x = _rms(lp["ln_post"], lat, v.rms_eps)
        lat = lat + _mlp(lp["mlp"], x, L.ACTIVATIONS[v.act])
        return lat, None

    lat, _ = jax.lax.scan(layer, lat, v.layers)
    return _rms(v.final_norm, lat, v.rms_eps)


def encode_idefics2(v: Idefics2Vision, pixel_values: jax.Array,
                    patch_attention_mask: jax.Array | None = None) -> jax.Array:
    """[N, 3, H, W] -> [N, n_latents, E_text]."""
    final, _ = vit_forward(v.vparams, v.vcfg, pixel_values, patch_attention_mask)
    return connector_forward(v, final)


def make_idefics2_encoder(v: Idefics2Vision):
    feats_fn = jax.jit(lambda px: encode_idefics2(v, px))

    def encode(seq):
        outs = []
        for im in seq.images:
            px = np.asarray(im["pixel_values"], np.float32)
            if px.ndim == 3:
                px = px[None]
            f = feats_fn(jnp.asarray(px))  # [n, n_latents, E]
            outs.append(f.reshape(-1, f.shape[-1]))
        return jnp.concatenate(outs, axis=0)

    return encode


# ------------------------------------------------------------------ loading
def load_idefics2(path: str, dtype=jnp.float32):
    """Load an HF idefics2 checkpoint dir. Returns
    (text_cfg, text_params, rope, Idefics2Vision, hf_config)."""
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

    names = set(where)
    base = "model." if any(n.startswith("model.vision_model.") for n in names) else ""

    vcfg = VisionConfig.from_hf(hf["vision_config"], siglip=True)
    vparams = vision_params_from_hf(get, base + "vision_model.", vcfg, dtype)

    def lin_nb(name):  # no-bias linear, transposed to (in, out)
        return jnp.asarray(np.ascontiguousarray(get(name + ".weight").T), dtype)

    cp = base + "connector."
    proj = {
        "gate": lin_nb(cp + "modality_projection.gate_proj"),
        "up": lin_nb(cp + "modality_projection.up_proj"),
        "down": lin_nb(cp + "modality_projection.down_proj"),
    }
    pcfg = hf["perceiver_config"]
    tcfg_d = dict(hf["text_config"])
    n_heads = pcfg.get("resampler_n_heads", 16)
    head_dim = pcfg.get("resampler_head_dim", 96)
    n_kv = pcfg.get("num_key_value_heads", 4)
    rp = cp + "perceiver_resampler."
    layers = []
    for i in range(pcfg.get("resampler_depth", 3)):
        lp = f"{rp}layers.{i}."
        layers.append({
            "q": lin_nb(lp + "self_attn.q_proj"),
            "k": lin_nb(lp + "self_attn.k_proj"),
            "v": lin_nb(lp + "self_attn.v_proj"),
            "o": lin_nb(lp + "self_attn.o_proj"),
            "ln_lat": jnp.asarray(get(lp + "input_latents_norm.weight"), dtype),
            "ln_ctx": jnp.asarray(get(lp + "input_context_norm.weight"), dtype),
            "ln_post": jnp.asarray(get(lp + "post_attention_layernorm.weight"), dtype),
            "mlp": {
                "gate": lin_nb(lp + "mlp.gate_proj"),
                "up": lin_nb(lp + "mlp.up_proj"),
                "down": lin_nb(lp + "mlp.down_proj"),
            },
        })
    vision = Idefics2Vision(
        vcfg=vcfg,
        vparams=vparams,
        proj=proj,
        latents=jnp.asarray(get(rp + "latents"), dtype),
        layers=jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        final_norm=jnp.asarray(get(rp + "norm.weight"), dtype),
        n_heads=n_heads,
        n_kv_heads=n_kv,
        head_dim=head_dim,
        rms_eps=pcfg.get("rms_norm_eps", 1e-6),
        act=pcfg.get("hidden_act", tcfg_d.get("hidden_act", "silu")),
    )

    tcfg_d.setdefault("architectures", ["MistralForCausalLM"])
    text_cfg = config_from_hf(tcfg_d)
    mapped = {}
    for n in names:
        if n.startswith("model.text_model."):
            mapped["model." + n[len("model.text_model."):]] = n
        elif n.startswith("model.lm_head."):
            mapped["lm_head." + n[len("model.lm_head."):]] = n
        elif n == "lm_head.weight":
            mapped[n] = n
    src = TensorSource(lambda n: get(mapped[n]), set(mapped))
    params = params_from_source(text_cfg, src, dtype)
    return text_cfg, params, make_rope(text_cfg), vision, hf
