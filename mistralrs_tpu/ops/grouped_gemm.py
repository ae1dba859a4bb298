"""Grouped (dropless-MoE) matmul backends.

The reference computes Mixtral/AnyMoE experts densely per selected token
group on CUDA (ref models/mixtral.rs:100-180, ops.rs TopKLastDimOp); the
TPU-native equivalent is one grouped GEMM over expert-sorted rows so only
the top-k (token, expert) pairs hit the MXU. Two exact backends:

- ``ragged``: ``jax.lax.ragged_dot`` — XLA-native ragged contraction.
  Verified on CPU; Mosaic lowering on this toolchain is validated by
  ``tests/test_tpu_paths.py::test_ragged_dot_moe_on_chip``.
- ``gmm``: the Pallas megablocks kernel
  (``jax.experimental.pallas.ops.tpu.megablox.gmm``) — [tm, tk] x [tk, tn]
  MXU tile GEMMs with per-tile group metadata. Rows are padded up to the
  m-tile and the pad is accounted to the LAST group: pad rows are zeros, so
  their outputs are zeros and are sliced off — exact for any group_sizes.

Selected by ``MISTRALRS_MOE_BACKEND`` (default ``ragged``) read at trace
time; on non-TPU backends gmm runs in Pallas interpret mode (tests). The
hardware A/B between the two lives in ``scripts/tpu_queue.sh``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_DEF_TILE = (128, 128, 128)  # (tm, tk, tn) — MXU-native tile


def moe_backend() -> str:
    return os.environ.get("MISTRALRS_MOE_BACKEND", "ragged")


def grouped_matmul(
    lhs: jax.Array,
    rhs: jax.Array,
    group_sizes: jax.Array,
    *,
    backend: str | None = None,
) -> jax.Array:
    """``out[g_start:g_end] = lhs[g_start:g_end] @ rhs[g]`` per group g.

    lhs: [M, K] rows sorted by group; rhs: [G, K, N]; group_sizes: [G] int32
    summing to M. Returns [M, N] in lhs.dtype (f32 accumulation on both
    backends).
    """
    backend = backend or moe_backend()
    if backend == "ragged":
        return jax.lax.ragged_dot(
            lhs, rhs, group_sizes, preferred_element_type=jnp.float32
        ).astype(lhs.dtype)
    if backend != "gmm":
        raise ValueError(f"unknown MoE backend {backend!r} (ragged|gmm)")
    return _gmm(lhs, rhs, group_sizes)


def _gmm(lhs: jax.Array, rhs: jax.Array, group_sizes: jax.Array) -> jax.Array:
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    m, k = lhs.shape
    _, _, n = rhs.shape
    tm, tk, tn = _DEF_TILE
    # the kernel requires m % tm == 0 (k/n tiles may be irregular); pad rows
    # to the tile and charge the pad to the last group — zero rows produce
    # zero outputs which we slice off below
    mp = -(-m // tm) * tm
    if mp != m:
        lhs = jnp.pad(lhs, ((0, mp - m), (0, 0)))
        group_sizes = group_sizes.at[-1].add(mp - m)
    out = gmm(
        lhs,
        rhs,
        group_sizes.astype(jnp.int32),
        preferred_element_type=jnp.float32,
        tiling=(tm, min(tk, k), min(tn, n)),
        interpret=jax.default_backend() != "tpu",
    )
    return out[:m].astype(lhs.dtype)


@functools.cache
def gmm_supported() -> bool:
    """Whether the installed JAX ships the megablocks kernel."""
    try:
        from jax.experimental.pallas.ops.tpu.megablox import gmm  # noqa: F401

        return True
    except ImportError:
        return False
