"""Pipeline parallelism: stage-sharded decoder forward over a "pp" mesh axis.

SURVEY §2.4 PP row: the reference's closest notion is *device mapping* —
per-layer device placement with activation `.to_device` hops and no overlap
(device_map.rs:39-101, hop at models/mistral.rs:576). The TPU-native
replacement is the canonical shard_map pipeline: the stacked layer axis is
sharded over the "pp" mesh axis (each device owns L/pp consecutive layers
and that slice of the paged KV pool), activations flow stage-to-stage with
`lax.ppermute`, and the batch is split into microbatches so all stages work
concurrently (GPipe schedule: pp + M - 1 ticks, fill/drain bubbles at the
ends). Idle ticks compute on garbage and are masked; their KV writes are
redirected to the reserved page-0 scratch slots (engine/block_manager.py
reserves page 0 for exactly this).

Use TP (parallel/mesh.py) first — on TPU, tensor parallelism over ICI is
almost always the better answer (SURVEY §7 "hard parts" #4); PP exists for
very-deep models whose stacked weights exceed a TP group's HBM. This module
deliberately keeps the pp mesh single-axis (no tp mixing inside a stage).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.decoder import DecoderParams, _block, _norm
from mistralrs_tpu.ops import attention as attn_ops
from mistralrs_tpu.ops.paged_attention import PagedAttnMeta, PagedKVCache
from mistralrs_tpu.ops.rope import RopeTable


def make_pp_mesh(devices: list[jax.Device] | None = None, pp: int | None = None) -> Mesh:
    """A single-axis ("pp",) mesh of `pp` stages."""
    devices = devices if devices is not None else jax.devices()
    pp = pp if pp is not None else len(devices)
    return Mesh(np.asarray(devices[:pp]).reshape(pp), ("pp",))


def pp_decoder_forward(
    params: DecoderParams,
    cfg: ModelConfig,
    rope: RopeTable,
    input_ids: jax.Array,  # [B, T] int32
    cache: PagedKVCache,
    meta: PagedAttnMeta,
    mesh: Mesh,
    *,
    microbatches: int | None = None,
) -> tuple[jax.Array, PagedKVCache]:
    """decoder_forward with the layer stack sharded over mesh axis "pp".

    Same contract as models/decoder.decoder_forward (paged cache only):
    returns (hidden [B, T, E] after the final norm, updated cache). The
    batch is processed as `microbatches` pipelined slices (default: the pp
    degree, capped at B). Requires a single homogeneous layer group (PP
    slices one stacked pytree; mixed-quant GGUF topologies pick TP instead).
    """
    assert len(params.layer_groups) == 1, "PP requires one homogeneous layer group"
    n = mesh.shape["pp"]
    L = params.num_layers
    assert L % n == 0, (L, n)
    B, T = input_ids.shape
    if microbatches is not None:
        M = microbatches
    else:
        M = min(n, B)
        while B % M:  # largest divisor of B that fits the stage count
            M -= 1
    assert B % M == 0, (B, M)
    Bm = B // M
    S = meta.block_tables.shape[1] * cache.page_size
    hm = cache.head_major

    # ---- global (replicated) step inputs, computed once outside shard_map
    h0 = jnp.take(params.embed, input_ids, axis=0)
    if cfg.embed_scale != 1.0:
        h0 = h0 * jnp.asarray(cfg.embed_scale, h0.dtype)
    cos, sin = rope.gather(meta.positions)  # [B, T, rot/2]
    q_offsets = meta.kv_lens - T
    bias_full = attn_ops.causal_mask_bias(T, S, q_offsets=q_offsets)
    pad = jnp.where(
        jnp.arange(S)[None] < meta.kv_lens[:, None], 0.0, attn_ops.NEG_INF
    )
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

    def mb_slice(x, mb):  # [B, ...] -> the microbatch's [Bm, ...] rows
        return jax.lax.dynamic_slice_in_dim(x, mb * Bm, Bm, axis=0)

    def local(gparams, ck_all, cv_all, h0, cos, sin, bias_full, bias_win,
              window_flags, positions, slot_mapping, block_tables, kv_lens,
              active):
        # gparams/ck_all/cv_all are this stage's [L/pp] layer slice
        stage = jax.lax.axis_index("pp")

        def run_layers(h, ck_all, cv_all, mmeta, bias_f, bias_w, c, s):
            def scan_body(h, xs):
                layer_params, ck, cv, use_win = xs
                bias = jnp.where(use_win, bias_w, bias_f)
                h, ck, cv = _block(
                    cfg, layer_params, h, c, s, rope.rot_dim, ck, cv,
                    mmeta, bias, None, use_win,
                )
                return h, (ck, cv)

            flags = jax.lax.dynamic_slice_in_dim(
                window_flags, stage * (L // n), L // n, axis=0
            )
            return jax.lax.scan(scan_body, h, (gparams, ck_all, cv_all, flags))

        def tick(carry, t):
            recv, ck_all, cv_all, outs = carry
            mb = t - stage
            valid = (mb >= 0) & (mb < M)
            mb_c = jnp.clip(mb, 0, M - 1)
            x_in = jnp.where(stage == 0, mb_slice(h0, mb_c), recv)
            # idle ticks write their garbage KV into the reserved page-0
            # scratch slots instead of corrupting live pages
            slots = jnp.where(valid, mb_slice(slot_mapping, mb_c), 0)
            mmeta = PagedAttnMeta(
                positions=mb_slice(positions, mb_c),
                slot_mapping=slots,
                block_tables=mb_slice(block_tables, mb_c),
                kv_lens=mb_slice(kv_lens, mb_c),
                active=mb_slice(active, mb_c),
                head_major=hm,
            )
            h, (ck_all, cv_all) = run_layers(
                x_in, ck_all, cv_all, mmeta,
                mb_slice(bias_full, mb_c), mb_slice(bias_win, mb_c),
                mb_slice(cos, mb_c), mb_slice(sin, mb_c),
            )
            # the last stage banks its finished microbatch; every stage
            # forwards its activation to the ring successor (the wrap-around
            # edge into stage 0 is ignored — stage 0 always reads h0)
            outs = jnp.where(
                valid & (stage == n - 1),
                jax.lax.dynamic_update_slice_in_dim(outs, h[None], mb_c, axis=0),
                outs,
            )
            recv = jax.lax.ppermute(
                h, "pp", [(i, (i + 1) % n) for i in range(n)]
            )
            return (recv, ck_all, cv_all, outs), None

        recv0 = jax.lax.pcast(
            jnp.zeros((Bm, T, h0.shape[-1]), h0.dtype), ("pp",), to="varying"
        )
        outs0 = jax.lax.pcast(
            jnp.zeros((M, Bm, T, h0.shape[-1]), h0.dtype), ("pp",), to="varying"
        )
        (_, ck_all, cv_all, outs), _ = jax.lax.scan(
            tick, (recv0, ck_all, cv_all, outs0), jnp.arange(n + M - 1)
        )
        return outs[None], ck_all, cv_all  # [1, M, Bm, T, E] -> pp-stacked

    lspec = P("pp")  # stacked layer leaves / cache: shard layer axis 0
    rspec = P()  # replicated step inputs
    gparams = params.layer_groups[0]
    outs, new_k, new_v = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: lspec, gparams),
            lspec, lspec, rspec, rspec, rspec, rspec, rspec, rspec,
            rspec, rspec, rspec, rspec, rspec,
        ),
        out_specs=(lspec, lspec, lspec),
    )(
        gparams, cache.k, cache.v, h0, cos, sin, bias_full, bias_win,
        window_flags, meta.positions, meta.slot_mapping, meta.block_tables,
        meta.kv_lens, meta.active,
    )
    # stage n-1 holds the finished activations: row -1 of the pp-stacked outs
    h = outs[-1].reshape(B, T, h0.shape[-1])
    h = _norm(cfg, params.final_norm, h)
    new_cache = type(cache)(k=new_k, v=new_v, head_major=cache.head_major)
    return h, new_cache


class PPTextPipeline:
    """Serving pipeline over a stage-sharded ("pp",) mesh: the same surface
    the engine drives (run_prefill_chunk(s) / run_decode), with every forward
    routed through pp_decoder_forward. Decode is single-step (the GPipe tick
    loop already pipelines microbatches inside one dispatch; an outer
    multi-token scan would nest scan-of-shard_map for little gain at pp's
    target regime — very deep models, prefill-heavy work).

    Use TP first (see module docstring); this exists so pipeline parallelism
    is a deployable serving mode, not only a forward primitive.
    """

    supports_multistep = False
    supports_topk_pack = False
    supports_batched_prefill = True
    is_speculative = False

    def __init__(self, cfg, params, rope, pc, mesh: Mesh, *,
                 microbatches: int | None = None):
        import math as _math

        assert "pp" in mesh.axis_names, mesh.axis_names
        assert len(params.layer_groups) == 1, \
            "PP requires one homogeneous layer group (mixed-quant topologies pick TP)"
        if microbatches is not None:
            assert pc.max_seqs % microbatches == 0, (pc.max_seqs, microbatches)
        self.cfg, self.rope, self.pc = cfg, rope, pc
        self.mesh = mesh
        self.microbatches = microbatches
        self.max_pages_per_seq = _math.ceil(pc.max_model_len / pc.page_size)
        self.head_major = bool(pc.kv_head_major) if pc.kv_head_major is not None else False
        lspec = P("pp")
        # stacked layer leaves + paged KV shard their layer axis over pp;
        # embed/norm/lm_head replicate
        gspec = jax.tree.map(
            lambda _: jax.sharding.NamedSharding(mesh, lspec),
            params.layer_groups[0],
        )
        groups = [jax.device_put(params.layer_groups[0], gspec)]
        self.params = type(params)(
            embed=jax.device_put(params.embed, jax.sharding.NamedSharding(mesh, P())),
            layer_groups=groups,
            final_norm=jax.tree.map(
                lambda x: jax.device_put(x, jax.sharding.NamedSharding(mesh, P())),
                params.final_norm,
            ),
            lm_head=jax.tree.map(
                lambda x: jax.device_put(x, jax.sharding.NamedSharding(mesh, P())),
                params.lm_head,
            ),
            group_sizes=params.group_sizes,
        )
        if pc.kv_quant:
            # the stage-sharded step rebuilds the cache without scale leaves
            # (pp_decoder_forward) — refuse rather than silently serve bf16
            raise NotImplementedError(
                "kv_quant is not supported with pipeline parallelism yet")
        cache = PagedKVCache.create(
            cfg.num_layers, pc.num_pages, pc.page_size, cfg.num_kv_heads,
            cfg.head_dim, pc.dtype, head_major=self.head_major,
        )
        self.cache = type(cache)(
            k=jax.device_put(cache.k, jax.sharding.NamedSharding(mesh, lspec)),
            v=jax.device_put(cache.v, jax.sharding.NamedSharding(mesh, lspec)),
            head_major=cache.head_major,
        )
        self._fwd = jax.jit(self._step, donate_argnums=(1,))
        self.last_greedy_pack = None
        self.last_topk_pack = None
        self.last_logits = None

    def _step(self, params, cache, ids, positions, slot_mapping, block_tables,
              kv_lens, active, last_idx):
        from mistralrs_tpu.models.decoder import compute_logits

        meta = PagedAttnMeta(
            positions=positions, slot_mapping=slot_mapping,
            block_tables=block_tables, kv_lens=kv_lens, active=active,
            head_major=self.head_major,
        )
        B = ids.shape[0]
        # clamp the microbatch count to the (static) batch of this call and
        # keep it a divisor of B (single-seq prefill runs at B=1)
        mb = self.microbatches
        if mb is not None:
            mb = max(1, min(mb, B))
            while B % mb:
                mb -= 1
        h, cache = pp_decoder_forward(
            params, self.cfg, self.rope, ids, cache, meta, self.mesh,
            microbatches=mb,
        )
        h_last = h[jnp.arange(B), last_idx]
        logits = compute_logits(params, self.cfg, h_last)
        top = jnp.argmax(logits, axis=-1)
        chosen = jnp.take_along_axis(logits, top[:, None], axis=-1)[:, 0]
        pack = jnp.stack([top.astype(jnp.float32), chosen])
        return logits, pack, cache

    # engine surface: delegate host bookkeeping to TextPipeline's methods
    def _run(self, ids, positions, slot_mapping, block_tables, kv_lens, active,
             last_idx, first_chunk=False, temps=None):
        logits, pack, self.cache = self._fwd(
            self.params, self.cache, jnp.asarray(ids), jnp.asarray(positions),
            jnp.asarray(slot_mapping), jnp.asarray(block_tables),
            jnp.asarray(kv_lens), jnp.asarray(active), jnp.asarray(last_idx),
        )
        self.last_greedy_pack = pack
        self.last_logits = logits
        return logits

    def __getattr__(self, name):
        # host-side helpers delegate to TextPipeline's methods, bound to
        # self (they only touch cfg/pc/cache/bookkeeping attrs we carry)
        from mistralrs_tpu.pipeline.text import TextPipeline

        attr = getattr(TextPipeline, name, None)
        if callable(attr):
            import types

            return types.MethodType(attr, self)
        raise AttributeError(name)
