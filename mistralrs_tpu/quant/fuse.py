"""Projection fusion: merge q/k/v (and gate/up) into single wide GEMMs.

Decode on TPU pays a fixed cost per kernel invocation (pipeline ramp,
dispatch bookkeeping); fusing 7 per-layer matmuls into 4 measured ~11% on
7B decode. Fusion is a pure layout transform: out-features concatenate on
the lane axis, which every packed quant layout here stores contiguously
(dense w [in,out], q4k qs/scale/minv [*, out], q8_0 q/scale, gptq/hqq
q/scale/zs), so packed formats fuse without dequantizing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mistralrs_tpu.quant.qlinear import Linear

# data keys concatenated on the out (lane) axis per kind
_CAT_AXIS1 = {
    "dense": ("w",),
    "gguf_q4k": ("qs", "scale", "minv"),
    "gguf_q5k": ("qs", "qh", "scale", "minv"),
    "gguf_q2k": ("q", "scale", "minv"),
    "gguf_q8_0": ("q", "scale"),
    "gguf_q6k": ("ql", "qh", "scale"),
    "gptq_2": ("q", "scale", "zs"),
    "gptq_4": ("q", "scale", "zs"),
    "gptq_8": ("q", "scale", "zs"),
    "gptq_b8": ("q", "scale", "zs"),
    "hqq_1": ("q", "scale", "zs"),
    "hqq_2": ("q", "scale", "zs"),
    "hqq_3": ("q", "scale", "zs"),
    "hqq_4": ("q", "scale", "zs"),
    "hqq_8": ("q", "scale", "zs"),
}


def fuse_linears(lins: list[Linear], interleave: int = 1) -> Linear | None:
    """Concatenate same-kind, same-in-features linears along out-features.
    Works on plain (2D) and stacked ([L, ...]) layouts alike: every layout
    here keeps `out` on the LAST axis of each data leaf (and bias is 1D/2D
    ending in out), so the concat axis is -1 throughout. Returns None when
    fusion isn't possible (mixed kinds, lora wrappers, g_idx gathers,
    unknown layouts).

    interleave = S > 1 produces the TP-shardable layout: each linear's out
    axis splits into S equal chunks and the fused axis is
    [l0_c0|l1_c0|...|l0_c1|l1_c1|...], so column-parallel sharding over S
    devices gives shard s exactly [l0_cs|l1_cs|...] — its own q/k/v heads
    (or gate/up features) with no cross-device reshuffle. Exact for every
    packed layout here because quant blocks run along `in`; each out
    feature's bytes are independent. Requires every out size % S == 0."""
    kinds = {l.kind for l in lins}
    if len(kinds) != 1:
        return None
    kind = lins[0].kind
    if kind not in _CAT_AXIS1:
        return None
    if len({l.shape[0] for l in lins}) != 1:
        return None
    if len({l.meta for l in lins}) != 1:
        return None
    if any("g_idx" in l.data for l in lins):
        return None
    if interleave > 1 and any(l.shape[1] % interleave for l in lins):
        return None
    # act-order row permutations (GPTQ desc_act): each linear sorts its q
    # rows by its OWN g_idx, so fusing is only sound when every input
    # permutation is identical (then the shared gather hoists past the
    # fused GEMM); different perms => different row orders, unfusable.
    perms = [l.data.get("in_perm") for l in lins]
    if any(p is not None for p in perms):
        p0 = perms[0]
        if p0 is None or not all(
            p is not None and p.shape == p0.shape and bool(jnp.all(p == p0))
            for p in perms[1:]
        ):
            return None
    has_bias = [l.data.get("b") is not None for l in lins]
    if any(has_bias) and not all(has_bias):
        return None
    if interleave > 1:
        outs = [l.shape[1] for l in lins]

        @jax.jit
        def cat(*xs):
            # split each out axis into S chunks, concat chunk-s-major
            chunked = [
                x.reshape(*x.shape[:-1], interleave, x.shape[-1] // interleave)
                for x in xs
            ]
            y = jnp.concatenate(chunked, axis=-1)  # [..., S, sum/S]
            return y.reshape(*y.shape[:-2], y.shape[-2] * y.shape[-1])
    else:
        cat = jax.jit(lambda *xs: jnp.concatenate(xs, axis=-1))
    data = {}
    for key in _CAT_AXIS1[kind]:
        data[key] = cat(*[l.data[key] for l in lins])
    if all(has_bias):
        data["b"] = cat(*[l.data["b"] for l in lins])
    # K-side constants (q6k perm tables, shared act-order in_perm) are
    # identical across same-in lins (in_perm equality checked above)
    for key in ("perm", "inv_perm", "in_perm"):
        if key in lins[0].data:
            data[key] = lins[0].data[key]
    out = sum(l.shape[1] for l in lins)
    return Linear(kind=kind, shape=(lins[0].shape[0], out), data=data, meta=lins[0].meta)


def split_linear(lin: Linear, sizes: list[int]) -> list[Linear] | None:
    """Inverse of fuse_linears: slice a Linear into out-feature spans (e.g.
    a GGUF-fused attn_qkv or phi3 gate_up tensor -> separate projections).
    Exact for every packed layout here because quant blocks run along the
    `in` axis — each output column's bytes are independent. Returns None
    for kinds whose layout can't be column-sliced (lora wrappers, g_idx)."""
    kind = lin.kind
    if kind not in _CAT_AXIS1 or "g_idx" in lin.data:
        return None
    assert sum(sizes) == lin.shape[1], (sizes, lin.shape)
    outs = []
    off = 0
    for size in sizes:
        data = {}
        for key in _CAT_AXIS1[kind]:
            data[key] = lin.data[key][..., off : off + size]
        if lin.data.get("b") is not None:
            data["b"] = lin.data["b"][..., off : off + size]
        for key in ("perm", "inv_perm", "in_perm"):
            if key in lin.data:
                data[key] = lin.data[key]
        outs.append(Linear(kind=kind, shape=(lin.shape[0], size), data=data, meta=lin.meta))
        off += size
    return outs


def pad_linear_out(lin: Linear, mult: int = 2048) -> Linear | None:
    """Zero-pad a packed Linear's out-features to a multiple of `mult`.

    The dequant GEMV kernels tile out on lanes; an out size whose largest
    power-of-two divisor is small forces a tiny block_o (e.g. the Q4_K_M
    lm_head: Q6_K [4096, 32000] -> block_o=256, the r3 sweep's worst tile
    at ~1.5x the 2048 tile's time). Zero bytes in every data leaf decode to
    w == 0 for every format here (scale rows are zeroed too, so q6k's
    (q-32) term is killed by scale=0); compute_logits slices the padded
    vocab back off. Returns None when the kind can't be padded."""
    kind = lin.kind
    if kind not in _CAT_AXIS1 or kind == "dense" or "g_idx" in lin.data:
        return None
    out = lin.shape[1]
    pad = (-out) % mult
    if pad == 0:
        return lin
    if pad > out // 8:
        # only worth it when the dead columns stay small (<12.5%): a tiny
        # vocab padded to 2048 would multiply the tensor, not trim a tile
        return None
    data = {}
    for key in _CAT_AXIS1[kind]:
        v = lin.data[key]
        data[key] = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, pad)])
    if lin.data.get("b") is not None:
        b = lin.data["b"]
        data["b"] = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, pad)])
    for key in ("perm", "inv_perm", "in_perm"):
        if key in lin.data:
            data[key] = lin.data[key]
    return Linear(kind=kind, shape=(lin.shape[0], out + pad), data=data,
                  meta=lin.meta)


# Fused-params memo: several pipelines over the SAME DecoderParams object
# (bench's batch-16 / single-stream / batch-32 engines; a speculative target
# shared with a verifier) must share one fused copy — gate+up alone is
# ~2.1 GB packed on a 7B, and three independent copies OOMed a 16 GB v5e
# (r3). Keyed by id(params) with a weakref guard + finalize-eviction.
_FUSE_MEMO: dict = {}


def fuse_decoder_params(params, interleave: int = 1):
    """Fuse q/k/v -> qkv and gate/up -> gateup in every scan group, operating
    directly on the stacked leaves (no per-layer unstacking: an unstack/
    re-stack round trip would transiently triple device memory on large
    models). Group structure and sizes are unchanged; the decoder dispatches
    on which keys are present. interleave > 1 = the TP-shardable layout
    (see fuse_linears); the caller must set cfg.fuse_interleave to match.

    Results are memoized per (params object, interleave): repeated calls
    with the same live object return the same fused arrays."""
    import dataclasses
    import weakref

    key = (id(params), interleave)
    hit = _FUSE_MEMO.get(key)
    if hit is not None and hit[0]() is params:
        return hit[1]

    new_groups = []
    for g in params.layer_groups:
        g = jax.tree.map(lambda x: x, g)
        attn = g["attn"]
        if all(k in attn for k in ("q", "k", "v")):
            fused = fuse_linears([attn["q"], attn["k"], attn["v"]],
                                 interleave=interleave)
            if fused is not None:
                # split sizes derive statically from ModelConfig in the decoder
                new_attn = {k: v for k, v in attn.items() if k not in ("q", "k", "v")}
                new_attn["qkv"] = fused
                g["attn"] = new_attn
            else:
                # mixed kinds (e.g. Q4_K_M puts attn_v in Q6_K while q/k are
                # Q4_K): fuse the q/k pair — decode pays a fixed cost per
                # GEMV call, so 3 calls -> 2 still buys measurable step time
                fused_qk = fuse_linears([attn["q"], attn["k"]],
                                        interleave=interleave)
                if fused_qk is not None:
                    new_attn = {k: v for k, v in attn.items()
                                if k not in ("q", "k")}
                    new_attn["qk"] = fused_qk
                    g["attn"] = new_attn
        mlp = g.get("mlp", {})
        if all(k in mlp for k in ("gate", "up")) and "anymoe" not in mlp:
            fused = fuse_linears([mlp["gate"], mlp["up"]],
                                 interleave=interleave)
            if fused is not None:
                new_mlp = {k: v for k, v in mlp.items() if k not in ("gate", "up")}
                new_mlp["gateup"] = fused
                g["mlp"] = new_mlp
        new_groups.append(g)
    lm_head = params.lm_head
    if lm_head is not None:
        # pow2-hostile vocab sizes (32000) force the GEMV kernels into tiny
        # out tiles; pad to the 2048 tile and compute_logits slices back
        padded = pad_linear_out(lm_head)
        if padded is not None:
            lm_head = padded
    fused = dataclasses.replace(params, layer_groups=new_groups,
                                lm_head=lm_head)
    _FUSE_MEMO[key] = (weakref.ref(params), fused)
    weakref.finalize(params, _FUSE_MEMO.pop, key, None)
    return fused


_RQ8_MEMO: dict = {}


def requant_q6k_params(params, gs: int = 64):
    """Requantize every Q6_K Linear (stacked or not) to the int8 per-gs
    layout (gguf_linear.requant_q6k_to_q8) — the serving fast lane for
    Q6_K-heavy checkpoints (Q4_K_M puts attn_v, 1/3 of ffn_down AND
    lm_head in Q6_K). Memoized per (params, gs) like fuse_decoder_params:
    several engines over the same params share one requantized copy."""
    import dataclasses
    import weakref

    from mistralrs_tpu.quant.gguf_linear import requant_q6k_to_q8
    from mistralrs_tpu.quant.qlinear import Linear

    key = (id(params), "rq8", gs)
    hit = _RQ8_MEMO.get(key)
    if hit is not None and hit[0]() is params:
        return hit[1]
    is_lin = lambda x: isinstance(x, Linear)  # noqa: E731

    def conv(leaf):
        if not is_lin(leaf) or leaf.kind != "gguf_q6k":
            return leaf
        if leaf.data["ql"].ndim == 3:  # stacked [L, ...] group leaf
            L = leaf.data["ql"].shape[0]
            outs = []
            for i in range(L):
                one = Linear(kind=leaf.kind, shape=leaf.shape,
                             data={k: v[i] for k, v in leaf.data.items()},
                             meta=leaf.meta)
                outs.append(requant_q6k_to_q8(one, gs))
            return Linear(kind="gguf_q8_0", shape=leaf.shape,
                          data={k: jnp.stack([o.data[k] for o in outs])
                                for k in outs[0].data},
                          meta=gs)
        return requant_q6k_to_q8(leaf, gs)

    new_groups = [jax.tree.map(conv, g, is_leaf=is_lin)
                  for g in params.layer_groups]
    lm = params.lm_head
    if is_lin(lm) and lm.kind == "gguf_q6k":
        lm = requant_q6k_to_q8(lm, gs)
    out = dataclasses.replace(params, layer_groups=new_groups, lm_head=lm)
    _RQ8_MEMO[key] = (weakref.ref(params), out)
    weakref.finalize(params, _RQ8_MEMO.pop, key, None)
    return out
