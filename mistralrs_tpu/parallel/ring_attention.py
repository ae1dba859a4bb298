"""Ring attention: sequence-parallel exact attention over a mesh axis.

SURVEY §2.4 / §5: the reference has no sequence parallelism (long context is
handled by sliding windows + prompt chunking); the TPU-native extension is
blockwise ring attention over ICI — each device holds a sequence shard of
Q/K/V, computes online-softmax partial attention against the K/V block it
currently holds, and passes that block to its ring neighbor with
`lax.ppermute`, overlapping compute with the collective. After `n` steps
every query block has attended to every KV block with exact softmax
normalization (flash-style running max / denominator).

This is the long-prefill building block for contexts that exceed one chip's
memory; decode stays on the paged per-chip cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _block_attend(q, k, v, q_start, kv_start, scale, causal):
    """Partial attention of a q block vs one kv block.

    q: [B, Tq, Hq, D]; k/v: [B, Tkv, Hkv, D]. Returns
    (scores_max [B,Hkv,G,Tq], exp_sum [B,Hkv,G,Tq], acc [B,Tq,Hq,D-shaped])
    in the running-softmax form (caller combines blocks)."""
    B, Tq, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, Tq, Hkv, G, D)
    s = jnp.einsum("bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32)
    s = s * scale
    if causal:
        q_ids = q_start + jnp.arange(Tq)
        kv_ids = kv_start + jnp.arange(k.shape[1])
        mask = kv_ids[None, :] <= q_ids[:, None]  # [Tq, Tkv]
        s = jnp.where(mask[None, None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1)  # [B,Hkv,G,Tq]
    p = jnp.exp(s - m[..., None])
    # rows fully masked: exp(NEG_INF - NEG_INF) = 1 -> zero them via l
    l = jnp.sum(jnp.where(s > NEG_INF / 2, p, 0.0), axis=-1)
    p = jnp.where(s[..., :] > NEG_INF / 2, p, 0.0)
    o = jnp.einsum("bhgts,bshd->bthgd", p.astype(q.dtype), v)
    return m, l, o.reshape(B, Tq, Hq, D)


def _ring_body(i, carry, *, axis, scale, causal, Tq):
    q, k, v, m, l, acc, q_start, kv_start = carry
    bm, bl, bo = _block_attend(q, k, v, q_start, kv_start, scale, causal)
    new_m = jnp.maximum(m, bm)
    # rescale previous accumulator and merge the new block (flash combine)
    alpha = jnp.exp(m - new_m)  # [B,Hkv,G,Tq]
    beta = jnp.exp(bm - new_m)
    l = l * alpha + bl * beta
    B, T, Hq, D = acc.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    a4 = alpha.transpose(0, 3, 1, 2).reshape(B, T, Hq)[..., None]
    b4 = beta.transpose(0, 3, 1, 2).reshape(B, T, Hq)[..., None]
    acc = acc * a4.astype(acc.dtype) + bo * b4.astype(acc.dtype)
    m = new_m
    # pass kv to the next ring neighbor; track the origin of the block we
    # now hold (our index - (i+1) mod n)
    n = jax.lax.psum(1, axis)
    perm = [(j, (j + 1) % n) for j in range(n)]
    k = jax.lax.ppermute(k, axis, perm)
    v = jax.lax.ppermute(v, axis, perm)
    kv_start = jax.lax.ppermute(kv_start, axis, perm)
    return (q, k, v, m, l, acc, q_start, kv_start)


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
        # mark the fresh accumulators as axis-varying so the fori_loop carry
        # types match the loop-body outputs, which vary over every sharded
        # axis (ring ppermute over `axis`; values differ per batch/head
        # shard too) — shard_map vma rules
        vary = tuple(a for a in (axis, batch_axis, head_axis) if a)
        m = jax.lax.pcast(jnp.full((Bl, Hkvl, G, Tl), NEG_INF, jnp.float32),
                          vary, to="varying")
        l = jax.lax.pcast(jnp.zeros((Bl, Hkvl, G, Tl), jnp.float32),
                          vary, to="varying")
        acc = jnp.zeros_like(ql)  # derived from ql: already axis-varying
        carry = (ql, kl, vl, m, l, acc, q_start, kv_start)
        carry = jax.lax.fori_loop(
            0, n,
            functools.partial(_ring_body, axis=axis, scale=scale,
                              causal=causal, Tq=Tl),
            carry,
        )
        _, _, _, m, l, acc, _, _ = carry
        norm = l.transpose(0, 3, 1, 2).reshape(Bl, Tl, Hql)[..., None]
        return (acc / jnp.maximum(norm, 1e-20).astype(acc.dtype))

    spec = P(batch_axis, axis, head_axis, None)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
