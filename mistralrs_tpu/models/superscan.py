"""Super-block layer scan: collapse periodic group fragmentation.

Mixed-kind checkpoints fragment the stacked layer scan: Q4_K_M's
use_more_bits pattern gives 17 scan groups for 32 layers (mostly
singletons/pairs), and the r4 on-chip A/B (scripts/group_ab.py) measured
the fragmentation cost at ~8% end-to-end single-stream DESPITE handing the
uniform arm +9% more weight bytes — 17 lax.scan calls + per-group xs
slicing beat the extra bytes.

This transform detects periodic runs in the group-structure sequence
(e.g. [A(2), B(1)] x 7) and restacks each run into ONE scan whose body
executes a whole pattern period (2 A-layers + 1 B-layer inline): leaves of
sub-dict i reshape to [n_reps, p_i, ...], the scan consumes n_reps, and
the body statically unrolls the period. 17 scans collapse to 4 for the
Q4_K_M mix. Pure layout transform — layer order and math are unchanged
(models/decoder.py::decoder_forward consumes the list-typed groups).

Reference note: no reference equivalent (the reference runs an eager
per-layer loop, mistralrs-core/src/models/*.rs); this is TPU/XLA-specific
compile-unit engineering.
"""

from __future__ import annotations

import dataclasses
import weakref
from typing import Any

import jax
import jax.numpy as jnp

from mistralrs_tpu.quant.qlinear import Linear


def _sig(g: dict, size: int) -> tuple:
    """Stackability signature of a group: treedef + per-leaf (kind, shape
    sans the [L] axis). Two groups with equal signatures hold layers of
    identical structure and can be stacked together."""
    leaves, treedef = jax.tree.flatten(
        g, is_leaf=lambda x: isinstance(x, Linear))

    def leaf_sig(x):
        if isinstance(x, Linear):
            return ("lin", x.kind, x.shape, x.meta,
                    tuple(sorted((k, v.shape[1:], str(v.dtype))
                                 for k, v in x.data.items())))
        return ("arr", x.shape[1:], str(x.dtype))

    return (treedef, size, tuple(leaf_sig(x) for x in leaves))


def _stack_run(groups: list[dict], n: int) -> dict:
    """n same-signature groups (leaves [size, ...]) -> one dict with leaves
    [n, size, ...]."""

    def cat(*xs):
        return jnp.stack(xs, axis=0)

    return jax.tree.map(cat, *groups)


def find_period(sigs: list, min_reps: int = 3) -> tuple[int, int, int] | None:
    """Longest periodic run in `sigs`: returns (start, period, reps) with
    reps >= min_reps maximizing covered groups, or None. period >= 2 only
    (period-1 runs are already merged by group_layers)."""
    m = len(sigs)
    best = None
    for q in (2, 3, 4):
        i = 0
        while i + q < m:
            # extend the run starting at i with period q
            j = i + q
            while j < m and sigs[j] == sigs[j - q]:
                j += 1
            reps = (j - i) // q
            if reps >= min_reps:
                covered = reps * q
                if best is None or covered > best[3]:
                    best = (i, q, reps, covered)
                i = i + reps * q
            else:
                i += 1
    if best is None:
        return None
    return best[0], best[1], best[2]


def build_superscan(params) -> Any:
    """DecoderParams -> DecoderParams with periodic group runs collapsed
    into list-typed super-groups ([subdict_0 .. subdict_{q-1}], leaves
    [n, p_i, ...]). Returns `params` unchanged when no pattern with >= 3
    reps exists (homogeneous models, PP single-group models)."""
    groups = params.layer_groups
    sizes = list(params.group_sizes)
    sigs = [_sig(g, s) for g, s in zip(groups, sizes)]
    hit = find_period(sigs)
    if hit is None:
        return params
    start, q, reps = hit
    end = start + q * reps
    pattern = []
    for k in range(q):
        run = [groups[start + r * q + k] for r in range(reps)]
        pattern.append(_stack_run(run, reps))
    p_total = sum(sizes[start + k] for k in range(q))
    new_groups = (groups[:start] + [pattern] + groups[end:])
    new_sizes = (tuple(sizes[:start]) + (reps * p_total,)
                 + tuple(sizes[end:]))
    # one pass: real checkpoints have at most one periodic run (Q4_K_M's
    # use_more_bits middle section); a second disjoint run would need
    # per-run recursion with index bookkeeping — not worth it
    return dataclasses.replace(params, layer_groups=new_groups,
                               group_sizes=new_sizes)


_MEMO: dict = {}


def superscan_decoder_params(params):
    """Memoized build_superscan (several engines over the same params must
    share one restacked copy, like quant/fuse.fuse_decoder_params).

    HBM cost: the restack is a full device COPY of the periodic run's
    weights (most of a Q4_K_M 7B), and the pre-stack group arrays stay
    alive as long as the caller's `params` does. A deployment mixing a
    batched engine (auto-superscan at max_seqs >= 16, pipeline/text.py)
    with a single-stream engine over the SAME params therefore holds both
    copies (~2x quantized model bytes) — fine on 16 GB v5e with one 7B,
    but drop the original params reference (as bench.py does) when every
    engine uses the superscanned copy."""
    key = id(params)
    hit = _MEMO.get(key)
    if hit is not None and hit[0]() is params:
        return hit[1]
    out = build_superscan(params)
    _MEMO[key] = (weakref.ref(params), out)
    weakref.finalize(params, _MEMO.pop, key, None)
    return out


def expand_supergroup(pattern: list, size: int) -> list[dict]:
    """Inverse transform for per-layer consumers (re_isq): a list-typed
    super-group -> per-layer dicts in original layer order."""
    # n/p_i from any array leaf of each sub-dict
    def np_of(sub):
        leaves = jax.tree.leaves(sub)
        return leaves[0].shape[0], leaves[0].shape[1]

    n = np_of(pattern[0])[0]
    out = []
    for r in range(n):
        for sub in pattern:
            _, p = np_of(sub)
            for j in range(p):
                out.append(jax.tree.map(lambda x, r=r, j=j: x[r, j], sub))
    assert len(out) == size, (len(out), size)
    return out
