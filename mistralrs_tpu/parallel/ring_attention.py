"""Ring attention: sequence-parallel exact attention over a mesh axis.

SURVEY §2.4 / §5: the reference has no sequence parallelism (long context is
handled by sliding windows + prompt chunking); the TPU-native extension is
blockwise ring attention over ICI — each device holds a sequence shard of
Q/K/V, computes online-softmax partial attention against the K/V block it
currently holds, and passes that block to its ring neighbor with
`lax.ppermute`, overlapping compute with the collective. After `n` steps
every query block has attended to every KV block with exact softmax
normalization. The per-block math and the running-softmax combine are the
shared ops/attention.py helpers (`block_attend` / `flash_combine`) — the
same recurrence the single-chip blockwise continuation path uses.

This is the long-prefill building block for contexts that exceed one chip's
memory; decode stays on the paged per-chip cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mistralrs_tpu.ops.attention import (
    NEG_INF,
    block_attend,
    finalize_flash,
    flash_combine,
)


def _ring_body(i, carry, *, axis, causal, Tl):
    qg, k, v, m, l, acc, q_start, kv_start = carry
    keep = jnp.ones((1, Tl, k.shape[1]), bool)
    if causal:
        q_ids = q_start + jnp.arange(Tl)
        kv_ids = kv_start + jnp.arange(k.shape[1])
        keep = (kv_ids[None, :] <= q_ids[:, None])[None]  # [1, Tq, Tkv]
    m, l, acc = flash_combine(m, l, acc, *block_attend(qg, k, v, keep))
    # pass kv to the next ring neighbor; track the origin of the block we
    # now hold (our index - (i+1) mod n)
    n = jax.lax.psum(1, axis)
    perm = [(j, (j + 1) % n) for j in range(n)]
    k = jax.lax.ppermute(k, axis, perm)
    v = jax.lax.ppermute(v, axis, perm)
    kv_start = jax.lax.ppermute(kv_start, axis, perm)
    return (qg, k, v, m, l, acc, q_start, kv_start)


def ring_attention(
    q: jax.Array,  # [B, T, Hq, D] GLOBAL arrays, sequence-sharded over `axis`
    k: jax.Array,  # [B, T, Hkv, D]
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "tp",
    scale: float | None = None,
    causal: bool = True,
    batch_axis: str | None = None,
    head_axis: str | None = None,
) -> jax.Array:
    """Exact attention with Q/K/V sharded along the sequence dimension.

    batch_axis / head_axis name mesh axes the batch / head dims are already
    sharded over (DP / TP riding along with SP); the ring only rotates KV
    over `axis`. Returns [B, T, Hq, D] with the same shardings.
    """
    T, D = q.shape[1], q.shape[3]
    scale = scale if scale is not None else D**-0.5
    n = mesh.shape[axis]
    assert T % n == 0, (T, n)
    Tl = T // n

    def local(ql, kl, vl):
        Bl, _, Hql, _ = ql.shape
        Hkvl = kl.shape[2]
        G = Hql // Hkvl
        idx = jax.lax.axis_index(axis)
        q_start = idx * Tl
        kv_start = idx * Tl
        qg = (ql.astype(jnp.float32) * scale).reshape(Bl, Tl, Hkvl, G, D)
        kf = kl.astype(jnp.float32)
        vf = vl.astype(jnp.float32)
        # mark the fresh accumulators as axis-varying so the fori_loop carry
        # types match the loop-body outputs, which vary over every sharded
        # axis (ring ppermute over `axis`; values differ per batch/head
        # shard too) — shard_map vma rules
        vary = tuple(a for a in (axis, batch_axis, head_axis) if a)
        m = jax.lax.pcast(jnp.full((Bl, Hkvl, G, Tl), NEG_INF, jnp.float32),
                          vary, to="varying")
        l = jax.lax.pcast(jnp.zeros((Bl, Hkvl, G, Tl), jnp.float32),
                          vary, to="varying")
        acc = jnp.zeros((Bl, Tl, Hkvl, G, D), jnp.float32)
        acc = acc + qg * 0.0  # derive from qg: already axis-varying
        carry = (qg, kf, vf, m, l, acc, q_start, kv_start)
        carry = jax.lax.fori_loop(
            0, n,
            functools.partial(_ring_body, axis=axis, causal=causal, Tl=Tl),
            carry,
        )
        _, _, _, m, l, acc, _, _ = carry
        return finalize_flash(l, acc).astype(ql.dtype)

    spec = P(batch_axis, axis, head_axis, None)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
