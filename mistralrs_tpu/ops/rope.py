"""Rotary position embeddings: table precomputation + application.

Reference parity: mistralrs-core/src/layers.rs —
RotaryEmbedding (candle fused rope, :400-470), PhiRotaryEmbedding (su/yarn
long+short factors, :82-260), Llama3RotaryEmbedding (:263-398), partial-dim
variants (phi2's rotary_dim < head_dim).

TPU design: all tables are precomputed once in float32 as ``[max_pos, rot/2]``
cos/sin arrays living in HBM; at step time we gather rows by the position ids
(a cheap static-shape gather) and apply the rotation in the model's compute
dtype. This replaces the reference's fused CUDA rope: XLA fuses the
gather+mul+add chain into the attention prologue on its own.

Convention: NEOX/interleaved-halves style (rotate_half), matching HF
transformers and every architecture the reference ships.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RopeTable:
    """Precomputed cos/sin tables, shape [max_pos, rot_dim//2] each (float32)."""

    cos: jax.Array
    sin: jax.Array
    rot_dim: int  # number of head dims rotated (== head_dim except partial rope)

    def gather(self, positions: jax.Array) -> tuple[jax.Array, jax.Array]:
        """positions [...,] int32 -> (cos, sin) each [..., rot_dim//2]."""
        return jnp.take(self.cos, positions, axis=0), jnp.take(self.sin, positions, axis=0)


def _default_inv_freq(head_dim: int, theta: float) -> np.ndarray:
    return 1.0 / theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)


def _llama3_inv_freq(inv_freq: np.ndarray, scaling: dict[str, Any]) -> np.ndarray:
    """Llama-3.1 wavelength-dependent frequency scaling (ref layers.rs:263-398)."""
    factor = scaling["factor"]
    low_freq_factor = scaling["low_freq_factor"]
    high_freq_factor = scaling["high_freq_factor"]
    orig_max = scaling["original_max_position_embeddings"]
    low_freq_wavelen = orig_max / low_freq_factor
    high_freq_wavelen = orig_max / high_freq_factor
    wavelen = 2.0 * math.pi / inv_freq
    # three bands: unscaled (short), fully scaled (long), smooth blend between
    smooth = (orig_max / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
    blended = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    out = np.where(wavelen < high_freq_wavelen, inv_freq, np.where(wavelen > low_freq_wavelen, inv_freq / factor, blended))
    return out


def _longrope_tables(
    head_dim: int,
    theta: float,
    max_pos: int,
    orig_max: int,
    short_factor: list[float],
    long_factor: list[float],
    rope_type: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Phi-3 'su'/longrope and 'yarn' scaled tables (ref layers.rs:82-260).

    Positions < orig_max use short_factor, beyond use long_factor; both are
    multiplied into the attention magnitude scale.
    """
    scale = max_pos / orig_max
    if scale <= 1.0:
        mscale = 1.0
    elif rope_type in ("su", "longrope"):
        mscale = math.sqrt(1.0 + math.log(scale) / math.log(orig_max))
    else:  # yarn
        mscale = 0.1 * math.log(scale) + 1.0
    inv_freq = _default_inv_freq(head_dim, theta)
    t = np.arange(max_pos, dtype=np.float64)
    short = np.asarray(short_factor, dtype=np.float64)
    long = np.asarray(long_factor, dtype=np.float64)
    freqs_short = np.outer(t, inv_freq / short)
    freqs_long = np.outer(t, inv_freq / long)
    use_long = (t >= orig_max)[:, None]
    freqs = np.where(use_long, freqs_long, freqs_short)
    return np.cos(freqs) * mscale, np.sin(freqs) * mscale


def compute_rope_table(
    head_dim: int,
    max_pos: int,
    theta: float = 10000.0,
    rope_scaling: dict[str, Any] | None = None,
    partial_rotary_factor: float = 1.0,
    original_max_position_embeddings: int | None = None,
) -> RopeTable:
    """Build the f32 cos/sin table for one architecture's rope flavor.

    rope_scaling follows the HF config schema: {"rope_type"/"type": ...}.
    Supported: none, "linear", "llama3", "su"/"longrope", "yarn".
    """
    rot_dim = int(head_dim * partial_rotary_factor)
    rot_dim -= rot_dim % 2
    kind = None
    if rope_scaling:
        kind = rope_scaling.get("rope_type", rope_scaling.get("type"))

    if kind in ("su", "longrope", "yarn"):
        orig = original_max_position_embeddings or rope_scaling.get(
            "original_max_position_embeddings", max_pos
        )
        cos, sin = _longrope_tables(
            rot_dim, theta, max_pos, orig,
            rope_scaling["short_factor"], rope_scaling["long_factor"], kind,
        )
        return RopeTable(jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32), rot_dim)

    inv_freq = _default_inv_freq(rot_dim, theta)
    if kind == "llama3":
        inv_freq = _llama3_inv_freq(inv_freq, rope_scaling)
    t = np.arange(max_pos, dtype=np.float64)
    if kind == "linear":
        t = t / rope_scaling["factor"]
    freqs = np.outer(t, inv_freq)
    return RopeTable(
        jnp.asarray(np.cos(freqs), jnp.float32),
        jnp.asarray(np.sin(freqs), jnp.float32),
        rot_dim,
    )


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, rot_dim: int) -> jax.Array:
    """Apply rotary embedding (rotate-half convention).

    x:   [..., T, H, D]   (time axis second-to-last-but-one; heads after time)
    cos: [..., T, rot/2]  broadcast over heads
    """
    dtype = x.dtype
    if rot_dim < x.shape[-1]:
        x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    else:
        x_rot, x_pass = x, None
    xf = x_rot.astype(jnp.float32)
    half = rot_dim // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    c = cos[..., None, :]  # insert head axis
    s = sin[..., None, :]
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    out = jnp.concatenate([r1, r2], axis=-1).astype(dtype)
    if x_pass is not None:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out
