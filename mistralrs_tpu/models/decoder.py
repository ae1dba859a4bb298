"""The unified decoder core: one scanned, functional transformer that covers
every text architecture in the reference's model zoo.

Reference parity: mistralrs-core/src/models/*.rs — each arch's
Attention/MLP/DecoderLayer/Model (e.g. mistral.rs:222-597). Per-arch knobs are
static `ModelConfig` fields; jit burns them into the compiled step.

TPU design notes:
- Layers are *stacked* (every param leaf gains a leading [L] axis) and the
  block loop is a `lax.scan`: one layer's HLO is compiled once regardless of
  depth, and the stacked layout is what pjit shards (PartitionSpec on the
  stacked leaves covers all layers at once).
- The KV cache is scanned alongside the params (xs) and re-emitted (ys) —
  a functional in-place update that XLA aliases to zero copies.
- GQA attention never materializes repeated KV heads (ops/attention.py).
- Attention masks (full + sliding-window) are built once per step outside the
  scan; layers select by a per-layer flag, so gemma2's alternating pattern
  costs one `where` instead of breaking the scan.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.ops import attention as attn_ops
from mistralrs_tpu.ops import layers as L
from mistralrs_tpu.ops.kv_cache import AttnMeta, KVCache, write_kv_rows
from mistralrs_tpu.ops.paged_attention import (
    PagedAttnMeta,
    PagedKVCache,
    gather_paged_kv,
    paged_decode_attention,
    write_paged_kv,
)


def _flash_dtype(q_dtype):
    """Streaming dtype for the flash prefill kernel. bf16 halves the
    kernel's HBM traffic on the pp path (VERDICT r1 weak #5) and is now the
    default: test_flash_prefill_bf16_matches_f32 passed on the real v5e
    toolchain (2026-08-18; softmax still accumulates in f32 inside the
    kernel). Set MISTRALRS_FLASH_BF16=0 to stream f32 for A/B."""
    import os

    import jax.numpy as jnp

    if os.environ.get("MISTRALRS_FLASH_BF16") == "0":
        return jnp.float32
    return q_dtype


def _use_flash_prefill(cfg: ModelConfig, T: int, meta) -> bool:
    """First-chunk prefill flash eligibility (static): chunk long enough for
    the kernel's 128-row blocks, no logit softcap (unsupported), window not
    clipped within the chunk, TPU backend."""
    if T < 128 or T % 128 or not meta.first_chunk:
        return False
    if cfg.attn_logit_softcap is not None:
        return False
    if cfg.sliding_window is not None and cfg.sliding_window < T:
        return False
    import jax

    return jax.default_backend() == "tpu"


def _use_splash_prefill(cfg: ModelConfig, T: int, meta) -> bool:
    """Splash-kernel prefill for first chunks the plain flash kernel rejects
    — logit softcap (gemma2) or sliding window clipping inside the chunk —
    which otherwise fall back to masked dense attention materializing
    [B, Hq, T, T] scores (ops/splash.py). Opt-in via MISTRALRS_SPLASH=1
    until test_splash_prefill_on_chip validates the kernel on the real
    toolchain; CPU runs use interpret mode (tests only)."""
    import os

    if T < 128 or T % 128 or not meta.first_chunk:
        return False
    if os.environ.get("MISTRALRS_SPLASH") != "1":
        return False
    window_clips = (
        cfg.sliding_window is not None
        and cfg.sliding_window_pattern != "none"
        and cfg.sliding_window < T
    )
    # the simple case (no softcap, window >= chunk) belongs to plain flash
    return cfg.attn_logit_softcap is not None or window_clips


def _use_ring_prefill(cfg: ModelConfig, T: int, meta) -> bool:
    """Sequence-parallel first-chunk prefill: the chunk's token dim is
    sharded over `meta.ring_axis` and attention runs as blockwise ring
    attention (parallel/ring_attention.py) — the >1-chip long-context path
    (SURVEY §2.4 SP row; no reference equivalent)."""
    if meta.ring_axis is None or not meta.first_chunk:
        return False
    if cfg.attn_logit_softcap is not None:
        return False
    if cfg.sliding_window is not None and cfg.sliding_window < T:
        return False
    return True


def _use_flash_continuation(cfg: ModelConfig, T: int, meta, span: int) -> bool:
    """Continuation-chunk flash eligibility: right-aligned flash over the
    full static span (ops/paged_attention.flash_prefill_continuation)."""
    if T < 128 or T % 128 or meta.first_chunk:
        return False
    # the right-aligned trick pads q to the full span: S^2/2 flash FLOPs vs
    # the dense path's T*S score bytes. Breakeven ~ S = 11*T; beyond 4k span
    # the quadratic padding loses and the blockwise online-softmax path
    # takes over (_use_blockwise_continuation)
    if span % 128 or span > 4096:
        return False
    if cfg.attn_logit_softcap is not None:
        return False
    if cfg.sliding_window is not None and cfg.sliding_window < span:
        return False
    import jax

    return jax.default_backend() == "tpu"


# decode (T=1) switches from the one-shot gather to the blockwise scan
# past this span: the gather's [B, Hkv, span, D] transient crashed the
# compiler at 32k (r4 longctx_ab: every bf16 arm failed with
# tpu_compile_helper exit 1; 16k compiled and ran at 48.5 tok/s B=8), so
# 16k stays on the measured-faster gather and 32k gets a path that exists.
_BLOCKWISE_DECODE_SPAN = 16384


def _use_blockwise_continuation(cfg: ModelConfig, T: int, meta, span: int) -> bool:
    """Long-span continuation chunks: blockwise online-softmax attention
    (ops/paged_attention.blockwise_prefill_continuation) — O(T * kv_block)
    memory where the dense gather path would materialize [B, Hq, T, span]
    scores. Engaged where the right-aligned flash trick bows out (> 4k),
    and for DECODE (T=1) past _BLOCKWISE_DECODE_SPAN where the one-shot
    gather stops compiling."""
    if meta.first_chunk:
        return False
    if T > 1:
        return span > 4096
    return span > _BLOCKWISE_DECODE_SPAN


def _use_paged_decode_kernel(cfg: ModelConfig, T: int, window_ok: bool, span: int = 0) -> bool:
    """Fused Pallas block-table decode kernel eligibility (static): single
    query token, TPU backend, and no sliding-window layer could clip context
    (the kernel masks by length only).

    DEFAULT OFF since r3: the on-chip A/B at batch 16 (scripts/ragged_ab.py)
    measured gather+SDPA at 1.101 / 1.565 ms/layer-step for spans 2k / 8k vs
    the kernel's 1.852 / 4.902 — the r1 "kernel wins ~20% at 16k" result did
    not hold on the current toolchain at serving batch sizes (the kernel
    grid is per-(seq, head) and underutilizes at B*Hkv >= 128 while the
    gather's one big einsum keeps the MXU busy). MISTRALRS_PAGED_DECODE=1
    re-enables for re-evaluation."""
    import os

    if os.environ.get("MISTRALRS_PAGED_DECODE") != "1":
        return False
    if T != 1 or span < 4096:
        return False
    import jax

    if jax.default_backend() != "tpu":
        return False
    if cfg.sliding_window is None or cfg.sliding_window_pattern == "none":
        return True
    return window_ok
from mistralrs_tpu.ops.rope import RopeTable, apply_rope
from mistralrs_tpu.quant.qlinear import Linear, linear


@struct.dataclass
class DecoderParams:
    """Model parameters.

    `layer_groups` holds one stacked pytree per run of consecutive layers
    with identical structure (same quant kinds/shapes); each group is
    scanned with `lax.scan`. A homogeneous model has one group; mixed-quant
    checkpoints (GGUF Q4_K_M alternates Q4_K/Q6_K per layer) and per-layer
    ISQ topologies split into several. `group_sizes` is static so jit
    specializes the group loop away."""

    embed: jax.Array  # [V, E]
    layer_groups: list[dict[str, Any]]
    final_norm: dict[str, jax.Array]
    lm_head: Linear | None = None  # None => tied to embed
    group_sizes: tuple[int, ...] = struct.field(pytree_node=False, default=())

    @property
    def num_layers(self) -> int:
        return sum(self.group_sizes)


def _norm(cfg: ModelConfig, p: dict[str, jax.Array], x: jax.Array) -> jax.Array:
    if cfg.norm == "layernorm":
        return L.layer_norm(x, p["w"], p.get("b"), cfg.norm_eps)
    return L.rms_norm(x, p["w"], cfg.norm_eps, offset=cfg.norm_offset)


def _mlp_split_rows() -> int:
    """Row threshold above which the MLP processes the token axis in
    sequential slices (r5, VERDICT r4 #5): the fused gateup activation at a
    batch-16 x 2048-token prefill chunk is a [32768, 28672] bf16 = 1.75 GB
    transient that OOMed the 16 GB v5e (PERF.md 13:33 UTC) and forced 1024
    chunks — which re-pay the per-chunk weight dequant. Slicing rows
    halves/quarters the transient while XLA CSEs the weight dequant across
    the slice calls (same Linear data), so one 2048-token chunk streams
    packed bytes ONCE per prefill. 0 disables."""
    import os

    return int(os.environ.get("MISTRALRS_MLP_SPLIT_ROWS", "16384"))


def _mlp(cfg: ModelConfig, p: dict[str, Any], x: jax.Array, lora_sc=None) -> jax.Array:
    thr = _mlp_split_rows()
    lead = x.shape[:-1]
    n_rows = 1
    for d in lead:
        n_rows *= d
    if thr and n_rows > thr and not cfg.is_moe:
        x2 = x.reshape(n_rows, x.shape[-1])
        n_sl = -(-n_rows // thr)
        step = -(-n_rows // n_sl)
        outs = [
            _mlp(cfg, p, jax.lax.slice_in_dim(
                x2, i * step, min((i + 1) * step, n_rows), axis=0), lora_sc)
            for i in range(n_sl)
        ]
        return jnp.concatenate(outs, axis=0).reshape(*lead, -1)
    act = L.ACTIVATIONS[cfg.act]
    if "gateup" in p:  # fused gate/up projection (quant/fuse.py)
        gu = linear(p["gateup"], x, lora_sc)
        I = cfg.intermediate_size
        S = cfg.fuse_interleave
        if S > 1:
            # shard-interleaved layout: chunk s = [gate_s|up_s]; computing
            # silu(gate_s)*up_s per chunk and re-merging yields h in natural
            # feature order, already sharded to match row-parallel `down`.
            gu4 = gu.reshape(*gu.shape[:-1], S, 2 * I // S)
            h = act(gu4[..., : I // S]) * gu4[..., I // S :]
            h = h.reshape(*gu.shape[:-1], I)
        else:
            h = act(gu[..., :I]) * gu[..., I:]
        return linear(p["down"], h, lora_sc)
    if cfg.mlp_style == "gated":
        return linear(
            p["down"], act(linear(p["gate"], x, lora_sc)) * linear(p["up"], x, lora_sc), lora_sc
        )
    return linear(p["fc2"], act(linear(p["fc1"], x, lora_sc)), lora_sc)


def _expert_slice(lin: Linear, e: int) -> Linear:
    """Expert e's Linear out of stacked packed expert arrays [E, ...]
    (K-side permutation tables are shared across experts)."""
    data = {
        k: (v if k in ("perm", "inv_perm") else v[e]) for k, v in lin.data.items()
    }
    return Linear(kind=lin.kind, shape=lin.shape, data=data, meta=lin.meta)


def _moe_mlp(cfg: ModelConfig, p: dict[str, Any], x: jax.Array, lora_sc=None) -> jax.Array:
    """Mixtral sparse MoE (ref models/mixtral.rs SparseMoeBlock).

    Two exact formulations selected by cfg.moe_grouped:
    - grouped (default unsharded): sort (token, k) pairs by expert and run
      per-expert GEMMs with lax.ragged_dot — only top-k pairs are computed
      (the TPU grouped-GEMM answer to the CUDA scatter kernels).
    - dense: every expert computes every token, combined by a [N, E] weight
      matrix — keeps a clean expert-axis sharding under EP meshes.
    """
    if cfg.moe_grouped and p["experts"]["gate"].kind == "dense":
        return _moe_mlp_grouped(cfg, p, x)
    B, T, H = x.shape
    xt = x.reshape(B * T, H)
    router_logits = linear(p["router"], xt).astype(jnp.float32)  # [N, E]
    topw, topi = jax.lax.top_k(router_logits, cfg.num_experts_per_tok)
    topw = jax.nn.softmax(topw, axis=-1)  # normalize over selected (mixtral)
    # combine weights as a dense [N, E] matrix
    combine = jax.nn.one_hot(topi, cfg.num_experts, dtype=jnp.float32) * topw[..., None]
    combine = combine.sum(axis=1)  # [N, E]
    act = L.ACTIVATIONS[cfg.act]
    ex = p["experts"]
    if ex["gate"].kind != "dense":
        # packed GGUF experts (ref quantized_llama.rs:473-530 MoE branch):
        # per-expert fused dequant-GEMMs on the stacked packed arrays, dense
        # dispatch — weights stream packed from HBM, which dominates decode
        out = jnp.zeros_like(xt)
        comb = combine.astype(xt.dtype)
        for e in range(cfg.num_experts):
            g = linear(_expert_slice(ex["gate"], e), xt)
            u = linear(_expert_slice(ex["up"], e), xt)
            d = linear(_expert_slice(ex["down"], e), act(g) * u)
            out = out + d * comb[:, e : e + 1]
        return out.reshape(B, T, H)
    # experts stacked: gate/up [E, H, I], down [E, I, H]
    g = jnp.einsum("nh,ehi->eni", xt, p["experts"]["gate"].data["w"].astype(xt.dtype))
    u = jnp.einsum("nh,ehi->eni", xt, p["experts"]["up"].data["w"].astype(xt.dtype))
    d = jnp.einsum("eni,eih->enh", act(g) * u, p["experts"]["down"].data["w"].astype(xt.dtype))
    out = jnp.einsum("enh,ne->nh", d, combine.astype(d.dtype))
    return out.reshape(B, T, H)


def _attention(
    cfg: ModelConfig,
    p: dict[str, Any],
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    rot_dim: int,
    cache_k: jax.Array,
    cache_v: jax.Array,
    meta: AttnMeta,
    bias: jax.Array,
    lora_sc=None,
    use_win=None,  # traced per-layer sliding-window flag (gemma2 alternation)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    B, T, _ = x.shape
    Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "qkv" in p:  # fused projection (quant/fuse.py)
        qkv = linear(p["qkv"], x, lora_sc)
        S = cfg.fuse_interleave
        if S > 1:
            # shard-interleaved layout: chunk s = [q_s|k_s|v_s] for TP shard
            # s; the reshape keeps every slice local to its device under
            # column-parallel sharding, and merging (S, Hq/S) restores the
            # natural head order.
            hq, hkv = Hq // S, Hkv // S
            qkv4 = qkv.reshape(B, T, S, (hq + 2 * hkv) * D)
            q = qkv4[..., : hq * D].reshape(B, T, Hq, D)
            k = qkv4[..., hq * D : (hq + hkv) * D].reshape(B, T, Hkv, D)
            v = qkv4[..., (hq + hkv) * D :].reshape(B, T, Hkv, D)
        else:
            q = qkv[..., : Hq * D].reshape(B, T, Hq, D)
            k = qkv[..., Hq * D : (Hq + Hkv) * D].reshape(B, T, Hkv, D)
            v = qkv[..., (Hq + Hkv) * D :].reshape(B, T, Hkv, D)
    elif "qk" in p:  # partial fusion: q+k same kind, v differs (Q4_K_M mix)
        qk = linear(p["qk"], x, lora_sc)
        S = cfg.fuse_interleave
        if S > 1:
            hq, hkv = Hq // S, Hkv // S
            qk4 = qk.reshape(B, T, S, (hq + hkv) * D)
            q = qk4[..., : hq * D].reshape(B, T, Hq, D)
            k = qk4[..., hq * D :].reshape(B, T, Hkv, D)
        else:
            q = qk[..., : Hq * D].reshape(B, T, Hq, D)
            k = qk[..., Hq * D :].reshape(B, T, Hkv, D)
        v = linear(p["v"], x, lora_sc).reshape(B, T, Hkv, D)
    else:
        q = linear(p["q"], x, lora_sc).reshape(B, T, Hq, D)
        k = linear(p["k"], x, lora_sc).reshape(B, T, Hkv, D)
        v = linear(p["v"], x, lora_sc).reshape(B, T, Hkv, D)
    if cfg.qk_norm:
        q = L.layer_norm(q, p["q_norm"]["w"], p["q_norm"].get("b"), cfg.norm_eps)
        k = L.layer_norm(k, p["k_norm"]["w"], p["k_norm"].get("b"), cfg.norm_eps)
    q = apply_rope(q, cos, sin, rot_dim)
    k = apply_rope(k, cos, sin, rot_dim)
    scale = cfg.query_scale if cfg.query_scale is not None else D**-0.5
    if isinstance(meta, PagedAttnMeta):
        hm = meta.head_major
        # int8-quantized pools arrive as (payload, scale) tuples; combined
        # (ragged-backend) pools arrive with cache_v=None (see
        # PagedKVCache.quantized/.combined + decoder_forward's scan xs)
        kv_quant = isinstance(cache_k, tuple)
        kv_combined = cache_v is None
        if kv_quant:
            from mistralrs_tpu.ops.paged_attention import write_paged_kv_q

            cache_k, cache_v = write_paged_kv_q(
                cache_k, cache_v, k, v, meta.slot_mapping, head_major=hm
            )
        elif kv_combined:
            from mistralrs_tpu.ops.ragged_attention import write_combined_kv

            cache_k = write_combined_kv(cache_k, k, v, meta.slot_mapping)
        else:
            cache_k, cache_v = write_paged_kv(
                cache_k, cache_v, k, v, meta.slot_mapping, head_major=hm
            )
        if _use_ring_prefill(cfg, T, meta):
            from mistralrs_tpu.parallel.ring_attention import ring_attention

            mesh_shape = dict(
                zip(meta.ring_mesh.axis_names, meta.ring_mesh.devices.shape)
            )
            batch_ok = B % mesh_shape.get("dp", 1) == 0
            heads_ok = Hkv % mesh_shape.get("tp", 1) == 0
            out = ring_attention(
                q, k, v, meta.ring_mesh, axis=meta.ring_axis, scale=scale,
                causal=True,
                batch_axis="dp" if batch_ok and "dp" in mesh_shape else None,
                head_axis="tp" if heads_ok and "tp" in mesh_shape else None,
            )
            # zero padding rows (they attended garbage) via active mask
            out = out * meta.active[:, None, None, None].astype(out.dtype)
            out = linear(p["o"], out.reshape(B, T, Hq * D), lora_sc)
            return out, cache_k, cache_v
        if _use_flash_prefill(cfg, T, meta):
            # first prefill chunk: context == the chunk itself; run the
            # Pallas flash kernel, skipping the paged gather and the
            # [B,Hq,T,S] score materialization entirely
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            rep = Hq // Hkv
            kf = jnp.repeat(k, rep, axis=2) if rep > 1 else k
            vf = jnp.repeat(v, rep, axis=2) if rep > 1 else v
            fdt = _flash_dtype(q.dtype)
            out = flash_attention(
                q.transpose(0, 2, 1, 3).astype(fdt),
                kf.transpose(0, 2, 1, 3).astype(fdt),
                vf.transpose(0, 2, 1, 3).astype(fdt),
                causal=True,
                sm_scale=scale,
            ).transpose(0, 2, 1, 3).astype(q.dtype)
            # zero padding rows (they attended garbage) via active mask
            out = out * meta.active[:, None, None, None].astype(out.dtype)
            out = linear(p["o"], out.reshape(B, T, Hq * D), lora_sc)
            return out, cache_k, cache_v
        if _use_splash_prefill(cfg, T, meta):
            from mistralrs_tpu.ops.splash import splash_prefill

            out = splash_prefill(
                q, k, v, scale=scale,
                sliding_window=(
                    cfg.sliding_window
                    if cfg.sliding_window is not None
                    and cfg.sliding_window_pattern != "none"
                    else None
                ),
                logits_softcap=cfg.attn_logit_softcap,
                use_win=use_win,
                interpret=jax.default_backend() != "tpu",
            )
            # zero padding rows (they attended garbage) via active mask
            out = out * meta.active[:, None, None, None].astype(out.dtype)
            out = linear(p["o"], out.reshape(B, T, Hq * D), lora_sc)
            return out, cache_k, cache_v
        # a sequence can never exceed its block-table span; if that span fits
        # inside the sliding window, length masking alone is exact
        pool_k = cache_k[0] if kv_quant else cache_k
        page = pool_k.shape[2] if hm else pool_k.shape[1]
        window_ok = (
            cfg.sliding_window is not None
            and meta.block_tables.shape[1] * page <= cfg.sliding_window
        )
        span = meta.block_tables.shape[1] * page
        if kv_combined and jax.default_backend() == "tpu":
            # unified ragged-paged-attention: ONE kernel for decode and
            # continuation chunks, window + softcap native
            from mistralrs_tpu.ops.ragged_attention import ragged_attention_padded

            out = ragged_attention_padded(
                q, cache_k, meta, scale=scale,
                sliding_window=(
                    cfg.sliding_window
                    if cfg.sliding_window is not None
                    and cfg.sliding_window_pattern != "none"
                    and not window_ok
                    else None
                ),
                logits_softcap=cfg.attn_logit_softcap,
                use_win=use_win,
            )
            out = out * meta.active[:, None, None, None].astype(out.dtype)
            out = linear(p["o"], out.reshape(B, T, Hq * D), lora_sc)
            return out, cache_k, cache_v
        # the Pallas decode/continuation kernels stream bf16 pools; int8 and
        # combined pools take the gather+dequant+SDPA path below
        if hm and not kv_quant and not kv_combined and _use_paged_decode_kernel(cfg, T, window_ok, span):
            # fused block-table decode: streams only the named pages
            # (ref paged_attention v1/v2 CUDA kernels)
            out = paged_decode_attention(
                q, cache_k, cache_v, meta,
                scale=scale, logits_softcap=cfg.attn_logit_softcap,
            )
            out = linear(p["o"], out.reshape(B, T, Hq * D), lora_sc)
            return out, cache_k, cache_v
        if not kv_quant and not kv_combined and _use_flash_continuation(cfg, T, meta, span):
            from mistralrs_tpu.ops.paged_attention import flash_prefill_continuation

            out = flash_prefill_continuation(q, cache_k, cache_v, meta, scale=scale)
            out = out * meta.active[:, None, None, None].astype(out.dtype)
            out = linear(p["o"], out.reshape(B, T, Hq * D), lora_sc)
            return out, cache_k, cache_v
        if not kv_combined and _use_blockwise_continuation(cfg, T, meta, span):
            # int8 pools ride the same blockwise path (per-block dequant);
            # this is the only long-span route that compiles at 64k int8
            # (the one-shot gather's bf16 transient is ~1.1 GB there)
            from mistralrs_tpu.ops.paged_attention import blockwise_prefill_continuation

            out = blockwise_prefill_continuation(
                q, cache_k, cache_v, meta, scale=scale,
                sliding_window=(
                    cfg.sliding_window
                    if cfg.sliding_window is not None
                    and cfg.sliding_window_pattern != "none"
                    and not window_ok  # span within window => length mask only
                    else None
                ),
                window_gate=use_win,
                logits_softcap=cfg.attn_logit_softcap,
            )
            out = out * meta.active[:, None, None, None].astype(out.dtype)
            out = linear(p["o"], out.reshape(B, T, Hq * D), lora_sc)
            return out, cache_k, cache_v
        if kv_quant:
            from mistralrs_tpu.ops.paged_attention import gather_paged_kv_q

            ctx_k, ctx_v = gather_paged_kv_q(
                cache_k, cache_v, meta.block_tables, head_major=hm,
                dtype=q.dtype,
            )
        elif kv_combined:
            # off-TPU fallback for the ragged backend: split the combined
            # pool into strided K/V views and take the gather+SDPA path
            from mistralrs_tpu.ops.ragged_attention import split_combined

            ck_view, cv_view = split_combined(cache_k)
            ctx_k, ctx_v = gather_paged_kv(
                ck_view, cv_view, meta.block_tables, head_major=False
            )
        else:
            ctx_k, ctx_v = gather_paged_kv(
                cache_k, cache_v, meta.block_tables, head_major=hm
            )
        paged_attn = attn_ops.sdpa_head_major if hm else attn_ops.sdpa
        out = paged_attn(
            q, ctx_k.astype(q.dtype), ctx_v.astype(q.dtype),
            scale=scale, mask=bias, logits_softcap=cfg.attn_logit_softcap,
        )
        out = linear(p["o"], out.reshape(B, T, Hq * D), lora_sc)
        return out, cache_k, cache_v
    else:
        cache_k, cache_v = write_kv_rows(cache_k, cache_v, k, v, meta.write_pos)
        ctx_k, ctx_v = cache_k, cache_v
    out = attn_ops.sdpa(
        q,
        ctx_k.astype(q.dtype),
        ctx_v.astype(q.dtype),
        scale=scale,
        mask=bias,
        logits_softcap=cfg.attn_logit_softcap,
    )
    out = linear(p["o"], out.reshape(B, T, Hq * D), lora_sc)
    return out, cache_k, cache_v


def _moe_mlp_grouped(cfg: ModelConfig, p: dict[str, Any], x: jax.Array) -> jax.Array:
    """Grouped dropless MoE dispatch: [N*K] (token, expert) pairs sorted by
    expert feed grouped per-expert GEMMs (lax.ragged_dot or the Pallas
    megablocks kernel — ops/grouped_gemm.py); outputs scatter-add back
    weighted by the renormalized router probs. Bit-compatible with the dense
    path (same per-pair math)."""
    from mistralrs_tpu.ops.grouped_gemm import grouped_matmul
    B, T, H = x.shape
    N = B * T
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    xt = x.reshape(N, H)
    router_logits = linear(p["router"], xt).astype(jnp.float32)  # [N, E]
    topw, topi = jax.lax.top_k(router_logits, K)
    topw = jax.nn.softmax(topw, axis=-1)  # normalize over selected (mixtral)
    eid = topi.reshape(-1)  # [N*K]
    order = jnp.argsort(eid, stable=True)
    tok_idx = jnp.arange(N * K) // K
    tok_sorted = tok_idx[order]
    gathered = jnp.take(xt, tok_sorted, axis=0)  # [N*K, H]
    group_sizes = jnp.bincount(eid, length=E).astype(jnp.int32)
    act = L.ACTIVATIONS[cfg.act]
    wg = p["experts"]["gate"].data["w"].astype(xt.dtype)  # [E, H, I]
    wu = p["experts"]["up"].data["w"].astype(xt.dtype)
    wd = p["experts"]["down"].data["w"].astype(xt.dtype)  # [E, I, H]
    g = grouped_matmul(gathered, wg, group_sizes)
    u = grouped_matmul(gathered, wu, group_sizes)
    d = grouped_matmul(act(g) * u, wd, group_sizes)  # [N*K, H]
    w_pair = topw.reshape(-1)[order].astype(d.dtype)  # sorted pair weights
    out = jnp.zeros((N, H), d.dtype).at[tok_sorted].add(d * w_pair[:, None])
    return out.reshape(B, T, H).astype(x.dtype)


def _anymoe_mlp(cfg: ModelConfig, p: dict[str, Any], x: jax.Array, lora_sc=None) -> jax.Array:
    """AnyMoE soft mixture over stacked expert MLPs (ref amoe/mod.rs MoeMlp
    :160-186): gate -> softmax -> weighted sum; dense mixture (few experts)
    keeps the MXU fed instead of top-k gathers."""
    moe = p["anymoe"]
    logits = linear(moe["gate"], x).astype(jnp.float32)  # [B, T, n]
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    e = moe["experts"]
    act = L.ACTIVATIONS[cfg.act]
    if "gate" in e:  # gated mlp family
        g = jnp.einsum("bth,nhi->nbti", x, e["gate"].astype(x.dtype))
        u = jnp.einsum("bth,nhi->nbti", x, e["up"].astype(x.dtype))
        d = jnp.einsum("nbti,nih->nbth", act(g) * u, e["down"].astype(x.dtype))
    else:
        h1 = jnp.einsum("bth,nhi->nbti", x, e["fc1"].astype(x.dtype))
        d = jnp.einsum("nbti,nih->nbth", act(h1), e["fc2"].astype(x.dtype))
    return jnp.einsum("nbth,btn->bth", d, w)


def _block(cfg, p, h, cos, sin, rot_dim, ck, cv, meta, bias, lora_sc=None, use_win=None):
    if "anymoe" in p["mlp"]:
        mlp_fn = _anymoe_mlp
    else:
        mlp_fn = _moe_mlp if cfg.is_moe else _mlp
    if cfg.block_style == "parallel":  # phi2
        x = _norm(cfg, p["input_norm"], h)
        attn_out, ck, cv = _attention(
            cfg, p["attn"], x, cos, sin, rot_dim, ck, cv, meta, bias, lora_sc,
            use_win,
        )
        h = h + attn_out + mlp_fn(cfg, p["mlp"], x, lora_sc)
        return h, ck, cv
    if cfg.block_style == "sandwich":  # gemma2
        x = _norm(cfg, p["input_norm"], h)
        attn_out, ck, cv = _attention(
            cfg, p["attn"], x, cos, sin, rot_dim, ck, cv, meta, bias, lora_sc,
            use_win,
        )
        h = h + _norm(cfg, p["post_attn_norm"], attn_out)
        x = _norm(cfg, p["pre_mlp_norm"], h)
        h = h + _norm(cfg, p["post_mlp_norm"], mlp_fn(cfg, p["mlp"], x, lora_sc))
        return h, ck, cv
    # prenorm (default)
    x = _norm(cfg, p["input_norm"], h)
    attn_out, ck, cv = _attention(
        cfg, p["attn"], x, cos, sin, rot_dim, ck, cv, meta, bias, lora_sc,
        use_win,
    )
    h = h + attn_out
    h = h + mlp_fn(cfg, p["mlp"], _norm(cfg, p["post_attn_norm"], h), lora_sc)
    return h, ck, cv


def decoder_forward(
    params: DecoderParams,
    cfg: ModelConfig,
    rope: RopeTable,
    input_ids: jax.Array,  # [B, T] int32
    cache: KVCache | PagedKVCache,
    meta: AttnMeta | PagedAttnMeta,
    xlora_scalings: jax.Array | None = None,  # [B, T, L, n_adapters]
    input_embeds: jax.Array | None = None,  # [B, T, E] (vision pipelines)
) -> tuple[jax.Array, KVCache | PagedKVCache]:
    """Run the decoder stack. Returns (hidden [B, T, E], updated cache).

    xlora_scalings: per-token/layer/adapter LoRA scalings (X-LoRA dual-pass,
    ref xlora_models/mod.rs:40-60); None for plain/LoRA models.
    input_embeds: precomputed embeddings (image features spliced in by the
    vision pipeline, ref vision pipeline forward_inputs); overrides the
    input_ids lookup when given."""
    B, T = input_ids.shape
    if isinstance(meta, PagedAttnMeta):
        S = meta.block_tables.shape[1] * cache.page_size
    else:
        S = cache.max_len
    if input_embeds is not None:
        h = input_embeds.astype(params.embed.dtype)
    else:
        h = jnp.take(params.embed, input_ids, axis=0)
        if cfg.embed_scale != 1.0:
            h = h * jnp.asarray(cfg.embed_scale, h.dtype)

    cos, sin = rope.gather(meta.positions)  # [B, T, rot/2]

    # masks built once per step, selected per layer by flag
    q_offsets = meta.kv_lens - T
    bias_full = attn_ops.causal_mask_bias(T, S, q_offsets=q_offsets)
    pad = jnp.where(jnp.arange(S)[None] < meta.kv_lens[:, None], 0.0, attn_ops.NEG_INF)
    bias_full = bias_full + pad[:, None, None, :]
    if cfg.sliding_window is not None and cfg.sliding_window_pattern != "none":
        bias_win = attn_ops.causal_mask_bias(
            T, S, q_offsets=q_offsets, sliding_window=cfg.sliding_window
        )
        bias_win = bias_win + pad[:, None, None, :]
    else:
        bias_win = bias_full
    window_flags = jnp.asarray(
        [cfg.layer_uses_sliding_window(i) for i in range(cfg.num_layers)]
    )

    sc_all = (
        None if xlora_scalings is None else jnp.moveaxis(xlora_scalings, 2, 0)
    )  # [L, B, T, n]

    def _inline_groups() -> bool:
        import os

        return os.environ.get("MISTRALRS_INLINE_GROUPS") == "1"

    def _stacked_kernels() -> bool:
        """Feed per-layer weights to the Pallas kernels by scalar-prefetch
        layer index into the FULL stacked arrays instead of lax.scan xs
        slices. The r4 profiler trace showed the xs slices materialize as
        async HBM->HBM copies of every layer's packed weights per step
        (custom-calls can't consume views) — ~122 MB/layer of extra
        traffic, the measured kernel-to-engine gap. DEFAULT ON since the
        on-chip A/B (superscan_ab, 15:29 UTC): single-stream 55.0 vs 44.6
        tok/s (+23%), batch-16 (with kv-splice) 596.5 vs 541.2 (+10%).
        MISTRALRS_STACKED_KERNELS=0 reverts."""
        import os

        if os.environ.get("MISTRALRS_STACKED_KERNELS", "1") != "1":
            return False
        import mistralrs_tpu.ops.quant_matmul  # noqa: F401 — registers STACKED_OK
        return True

    def _kv_splice() -> bool:
        """Accumulate per-group KV results into the full donated cache via
        dynamic_update_slice instead of parts+concatenate. Alone it
        measured a small single-stream loss (42.8 vs 44.6), but COUPLED
        with the stacked-kernel scan it is the winning combination
        (batch-16 596.5 vs stacked-alone 498.5; single-stream parity) —
        default follows the stacked gate. MISTRALRS_KV_SPLICE=0/1
        overrides."""
        import os

        v = os.environ.get("MISTRALRS_KV_SPLICE")
        if v is not None:
            return v == "1"
        return _stacked_kernels()

    def _scan_unroll() -> int:
        """Layer-scan unroll factor (MISTRALRS_SCAN_UNROLL, default 1).
        step_decompose (r3) measured a per-scan-iteration overhead on top of
        the layer's own op time; unrolling lets XLA schedule across layer
        boundaries (weight DMA of layer i+1 behind compute of layer i) at
        the cost of 'unroll'x the layer HLO in the compiled program."""
        import os

        try:
            return max(1, int(os.environ.get("MISTRALRS_SCAN_UNROLL", "1")))
        except ValueError:
            return 1

    def scan_body(h, xs):
        if sc_all is None:
            layer_params, ck, cv, use_win = xs
            sc = None
        else:
            layer_params, ck, cv, use_win, sc = xs
        bias = jnp.where(use_win, bias_win, bias_full)
        h, ck, cv = _block(
            cfg, layer_params, h, cos, sin, rope.rot_dim, ck, cv, meta, bias,
            sc, use_win,
        )
        return h, (ck, cv)

    def super_scan(pattern, size, ck, cv, wf, sc_g):
        """One scan over a periodic super-group (models/superscan.py): the
        body executes a whole pattern period (p_total layers, statically
        unrolled) per iteration; sub-dict leaves arrive as [p_i, ...].
        Collapses Q4_K_M's 17 fragment scans to 4 (r4 on-chip group_ab:
        fragmentation cost ~8% end-to-end despite +9% bytes).

        KV pools travel as the scan CARRY ([size, ...] whole-group) with
        dynamic_(index|update)_in_dim at the traced layer index. v1/v2
        losses (superscan_ab 13:48: 37.6/38.1 vs 43.8 tok/s) are now
        attributed to WEIGHT xs slicing — every iteration materialized the
        whole period's packed weights as HBM copies (the same mechanism
        the stacked-kernel path fixed, profile_step 15:00/17:05 UTC) — so
        in stacked mode the weights stay OUT of xs as FLAT [n*p_i, ...]
        closure arrays bound per (r, j) by scalar-prefetch layer index."""
        from mistralrs_tpu.quant.qlinear import Linear as _Lin

        p_sizes = [jax.tree.leaves(sub)[0].shape[1] for sub in pattern]
        p_total = sum(p_sizes)
        n = size // p_total
        stacked = _stacked_kernels()
        if stacked:
            # flatten [n, p_i, ...] -> [n*p_i, ...] (free reshape) so the
            # stacked kernels index layers directly
            def flat(leaf):
                return leaf.reshape(leaf.shape[0] * leaf.shape[1],
                                    *leaf.shape[2:])

            pattern = [jax.tree.map(flat, sub) for sub in pattern]
        rs = lambda a: a.reshape(n, p_total, *a.shape[1:])
        xs = (rs(wf), jnp.arange(n, dtype=jnp.int32))
        if sc_g is not None:
            xs = xs + (rs(sc_g),)

        def bind_sub(sub, r, j, p_i):
            if stacked:
                def f(leaf):
                    if isinstance(leaf, _Lin):
                        return _Lin(kind=leaf.kind, shape=leaf.shape,
                                    data={**leaf.data, "lidx": r * p_i + j},
                                    meta=leaf.meta)
                    return jnp.take(leaf, r * p_i + j, axis=0)
                return jax.tree.map(
                    f, sub, is_leaf=lambda x: isinstance(x, _Lin))
            sub_r = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, r, 0,
                                                       keepdims=False), sub)
            return jax.tree.map(lambda x, j=j: x[j], sub_r)

        def body(carry, xs):
            h, ck, cv = carry
            if sc_g is None:
                use_win, r = xs
                sc_rep = None
            else:
                use_win, r, sc_rep = xs
            jt = 0
            for i, sub in enumerate(pattern):
                for j in range(p_sizes[i]):
                    lidx = r * p_total + jt
                    lp = bind_sub(sub, r, j, p_sizes[i])
                    bias = jnp.where(use_win[jt], bias_win, bias_full)
                    take = lambda b: jax.lax.dynamic_index_in_dim(
                        b, lidx, 0, keepdims=False)
                    ckj = jax.tree.map(take, ck)
                    cvj = None if cv is None else jax.tree.map(take, cv)
                    scj = None if sc_rep is None else sc_rep[jt]
                    h, ckj, cvj = _block(
                        cfg, lp, h, cos, sin, rope.rot_dim, ckj, cvj, meta,
                        bias, scj, use_win[jt],
                    )
                    put = lambda b, nb: jax.lax.dynamic_update_index_in_dim(
                        b, nb, lidx, 0)
                    ck = jax.tree.map(put, ck, ckj)
                    if cv is not None:
                        cv = jax.tree.map(put, cv, cvj)
                    jt += 1
            return (h, ck, cv), None

        (h2, nk, nv), _ = jax.lax.scan(body, (h, ck, cv), xs)
        return h2, nk, nv

    kv_quant = getattr(cache, "quantized", False)
    kv_combined = getattr(cache, "combined", False)
    # split pools (r5): one array per scan group — per-group "slices" are
    # whole arrays, so there is no slice/splice at group boundaries at all
    is_split = getattr(cache, "is_split", False)
    if is_split:
        assert tuple(cache.splits) == tuple(params.group_sizes), (
            f"split KV pool partition {cache.splits} must match the scan "
            f"groups {params.group_sizes} (re-partition on regroup)")
    # full-cache trees: inline groups write straight into these (per-layer
    # static-index updates on the donated buffers — the intermediate
    # stack/concat variants measured as pool-copy losses on-chip)
    if kv_quant:
        acc_k, acc_v = (cache.k, cache.k_scale), (cache.v, cache.v_scale)
    elif kv_combined:
        acc_k, acc_v = cache.k, None
    else:
        acc_k, acc_v = cache.k, cache.v
    inline_mode = _inline_groups() and not is_split
    acc_mode = (inline_mode or _kv_splice()) and not is_split
    new_k_parts, new_v_parts = [], []
    offset = 0
    for gi, (gparams, size) in enumerate(zip(params.layer_groups,
                                             params.group_sizes)):
        sl = lambda a: jax.lax.slice_in_dim(a, offset, offset + size, axis=0)
        if is_split:
            if kv_quant:
                ck = (cache.k[gi], cache.k_scale[gi])
                cv = (cache.v[gi], cache.v_scale[gi])
            else:
                ck, cv = cache.k[gi], cache.v[gi]
        else:
            ck = jax.tree.map(sl, acc_k)
            cv = None if acc_v is None else jax.tree.map(sl, acc_v)
        if isinstance(gparams, (list, tuple)):
            h, nk, nv = super_scan(
                gparams, size, ck, cv, sl(window_flags),
                None if sc_all is None else sl(sc_all))
        elif size <= 4 and inline_mode:
            # fragmented-mix experiment (MISTRALRS_INLINE_GROUPS=1): run
            # tiny groups as straight-line layer calls instead of
            # 1-2-iteration scans — Q4_K_M's 17-group mix measured ~8%
            # scan-fragmentation cost (group_ab). KV updates go DIRECTLY
            # into the full donated cache at static layer indices.
            wf_g = sl(window_flags)
            sc_gl = None if sc_all is None else sl(sc_all)
            for i in range(size):
                lp = jax.tree.map(lambda x, i=i: x[i], gparams)
                bias = jnp.where(wf_g[i], bias_win, bias_full)
                cki = jax.tree.map(lambda b, i=i: b[i], ck)
                cvi = (None if cv is None
                       else jax.tree.map(lambda b, i=i: b[i], cv))
                sci = None if sc_gl is None else sc_gl[i]
                h, cki, cvi = _block(
                    cfg, lp, h, cos, sin, rope.rot_dim, cki, cvi, meta,
                    bias, sci, wf_g[i],
                )
                li = offset + i
                acc_k = jax.tree.map(
                    lambda b, nb, li=li: b.at[li].set(nb), acc_k, cki)
                if acc_v is not None:
                    acc_v = jax.tree.map(
                        lambda b, nb, li=li: b.at[li].set(nb), acc_v, cvi)
            nk = nv = None  # written in place above
        elif (_stacked_kernels() and not cfg.is_moe
              and "anymoe" not in gparams.get("mlp", {})):
            # stacked-kernel scan: weights stay OUT of xs (loop invariants);
            # the body binds each layer by index and the q4k/q6k kernels
            # tile directly from the stacked arrays (no per-layer copy)
            from mistralrs_tpu.quant.qlinear import Linear as _Lin

            def bind(r):
                def f(leaf):
                    if isinstance(leaf, _Lin):
                        return _Lin(kind=leaf.kind, shape=leaf.shape,
                                    data={**leaf.data, "lidx": r},
                                    meta=leaf.meta)
                    return jnp.take(leaf, r, axis=0)
                return jax.tree.map(
                    f, gparams, is_leaf=lambda x: isinstance(x, _Lin))

            def scan_body_st(h, xs):
                if sc_all is None:
                    r, ck, cv, use_win = xs
                    sc = None
                else:
                    r, ck, cv, use_win, sc = xs
                bias = jnp.where(use_win, bias_win, bias_full)
                h, ck, cv = _block(
                    cfg, bind(r), h, cos, sin, rope.rot_dim, ck, cv, meta,
                    bias, sc, use_win,
                )
                return h, (ck, cv)

            xs = (jnp.arange(size, dtype=jnp.int32), ck, cv,
                  sl(window_flags))
            if sc_all is not None:
                xs = xs + (sl(sc_all),)
            h, (nk, nv) = jax.lax.scan(scan_body_st, h, xs,
                                       unroll=_scan_unroll())
        else:
            xs = (gparams, ck, cv, sl(window_flags))
            if sc_all is not None:
                xs = xs + (sl(sc_all),)
            h, (nk, nv) = jax.lax.scan(scan_body, h, xs, unroll=_scan_unroll())
        if acc_mode:
            if nk is not None:  # scan/super groups: splice into the full tree
                upd = lambda b, ng, o=offset: jax.lax.dynamic_update_slice_in_dim(
                    b, ng, o, axis=0)
                acc_k = jax.tree.map(upd, acc_k, nk)
                if acc_v is not None:
                    acc_v = jax.tree.map(upd, acc_v, nv)
        else:
            new_k_parts.append(nk)
            new_v_parts.append(nv)
        offset += size
    def cat(parts):
        return parts[0] if len(parts) == 1 else jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts)
    if is_split:
        if kv_quant:  # per-part (payload, scale) pairs -> field tuples
            new_k = (tuple(p[0] for p in new_k_parts),
                     tuple(p[1] for p in new_k_parts))
            new_v = (tuple(p[0] for p in new_v_parts),
                     tuple(p[1] for p in new_v_parts))
        else:
            new_k, new_v = tuple(new_k_parts), tuple(new_v_parts)
    elif acc_mode:
        new_k, new_v = acc_k, acc_v
    else:
        new_k = cat(new_k_parts)
        new_v = cat(new_v_parts)
    h = _norm(cfg, params.final_norm, h)
    if hasattr(cache, "head_major"):  # paged pool: preserve the layout flag
        splits = getattr(cache, "splits", None)
        if kv_quant:
            new_cache = type(cache)(k=new_k[0], v=new_v[0], k_scale=new_k[1],
                                    v_scale=new_v[1],
                                    head_major=cache.head_major,
                                    splits=splits)
        else:  # new_v is None for combined pools
            new_cache = type(cache)(k=new_k, v=new_v,
                                    head_major=cache.head_major,
                                    splits=splits)
    else:
        new_cache = type(cache)(k=new_k, v=new_v)
    return h, new_cache


def compute_logits(params: DecoderParams, cfg: ModelConfig, h: jax.Array) -> jax.Array:
    """h: [..., E] -> logits [..., V]. Applies gemma2 final softcapping."""
    if params.lm_head is not None:
        logits = linear(params.lm_head, h)
        if logits.shape[-1] != cfg.vocab_size:
            # lm_head out-padded to the kernel tile (quant/fuse.py
            # pad_linear_out); padded columns are exact zeros but real
            # logits can be all-negative, so they must come off before
            # argmax/top-k
            logits = logits[..., : cfg.vocab_size]
    else:
        logits = jnp.dot(h, params.embed.astype(h.dtype).T)
    logits = logits.astype(jnp.float32)
    if cfg.final_logit_softcap is not None:
        logits = L.softcap(logits, cfg.final_logit_softcap)
    return logits
