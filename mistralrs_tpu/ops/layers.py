"""Elementwise / normalization layer ops.

Reference parity: mistralrs-core/src/layers.rs (RmsNorm :30-80, gemma variant,
activation zoo). These are deliberately thin jnp functions — XLA fuses them into
the surrounding matmuls, which is the TPU-native replacement for the reference's
hand-fused CUDA epilogues (cublaslt/mod.rs).

All norms accumulate in float32 regardless of input dtype (matches the
reference's `RmsNorm` which casts to the "internal dtype").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float, *, offset: float = 0.0) -> jax.Array:
    """RMSNorm with f32 accumulation.

    ``offset=1.0`` gives the Gemma variant ((1 + w) * normed, weights stored
    zero-centered; ref layers.rs RmsNorm::new_gemma).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    out = normed * (weight.astype(jnp.float32) + offset)
    return out.astype(dtype)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array | None, eps: float) -> jax.Array:
    """LayerNorm with f32 accumulation (phi2 / starcoder2 / vision towers)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def gelu_erf(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's sigmoid-approximation gelu (ref clip.rs QuickGelu)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {
    "silu": silu,
    "swish": silu,
    "gelu": gelu_erf,
    "gelu_new": gelu_tanh,
    "gelu_tanh": gelu_tanh,
    "gelu_pytorch_tanh": gelu_tanh,
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
}


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    """SwiGLU combine: silu(gate) * up (llama/mistral-family MLPs)."""
    return silu(gate) * up


def geglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    return gelu_tanh(gate) * up


def softcap(x: jax.Array, cap: float) -> jax.Array:
    """Gemma-2 style logit soft-capping: cap * tanh(x / cap)."""
    return cap * jnp.tanh(x / cap)
