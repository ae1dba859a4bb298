"""KV caches and per-step attention metadata.

Reference parity: mistralrs-core/src/pipeline/cache_manager.rs (the non-paged
per-sequence cache) and paged_attention/cache_engine.rs (block KV tensors).

TPU design: the reference clones per-sequence KV tensors into a batched cache
every step (cache_manager.rs:234-306) — a host-driven copy storm. Here the
cache is a *persistent, preallocated, slotted* device array
``[L, B_slots, S_max, Hkv, D]``: a sequence owns a batch slot for its
lifetime, writes land via per-row dynamic-update-slice inside the jitted
step, and nothing is cloned in or out. The paged variant
(``[L, num_blocks, block_size, Hkv, D]`` + block tables) lives alongside and
shares the same write metadata; see ops/paged_attention.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AttnMeta:
    """Per-step batch metadata (all static-shape device arrays).

    positions: [B, T] absolute position of each query token (rope gather);
               padding rows can hold any valid index.
    write_pos: [B] start offset where this step's K/V rows are written
               (== positions[:, 0] for contiguous chunks).
    kv_lens:   [B] valid context length per row AFTER this step's write
               (used for attention masking).
    active:    [B] 1.0 for live rows, 0.0 for padding slots.
    """

    positions: jax.Array
    write_pos: jax.Array
    kv_lens: jax.Array
    active: jax.Array


@struct.dataclass
class KVCache:
    """Dense slotted cache. k/v: [L, B, S, Hkv, D]."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def create(cls, num_layers, batch, max_len, kv_heads, head_dim, dtype=jnp.bfloat16):
        shape = (num_layers, batch, max_len, kv_heads, head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def write_kv_rows(
    cache_k: jax.Array,
    cache_v: jax.Array,
    new_k: jax.Array,
    new_v: jax.Array,
    write_pos: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Write one layer's new KV into its slotted cache.

    cache_k/v: [B, S, Hkv, D]; new_k/v: [B, T, Hkv, D]; write_pos: [B].
    Per-row contiguous writes -> vmapped dynamic_update_slice (a cheap
    in-place XLA update; no gather/scatter needed for the dense cache).
    """

    def row(ck, cv, nk, nv, pos):
        ck = jax.lax.dynamic_update_slice(ck, nk.astype(ck.dtype), (pos, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, nv.astype(cv.dtype), (pos, 0, 0))
        return ck, cv

    return jax.vmap(row)(cache_k, cache_v, new_k, new_v, write_pos)
