"""Text-model pipeline: jitted prefill/decode steps over the paged KV cache.

Reference parity: pipeline/mod.rs `Pipeline::step` (:204-395) +
inputs_processor.rs (`make_prompt_chunk` :111-260, slot mappings / block
tables :147-197). The reference rebuilds ragged batches with dynamic shapes
each step; here every step function has a *static* shape signature —
decode runs at the fixed slot width, prefill chunks snap to power-of-two
buckets — so XLA compiles each variant exactly once (SURVEY.md §7 hard
part 3).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.decoder import DecoderParams, compute_logits, decoder_forward
from mistralrs_tpu.engine.sequence import Sequence
from mistralrs_tpu.ops.paged_attention import PagedAttnMeta, PagedKVCache
from mistralrs_tpu.ops.rope import RopeTable


# candidates returned by the device sampled-decode fast path
TOPK_PACK = 64


def _next_bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclasses.dataclass
class PipelineConfig:
    page_size: int = 16
    # None = size the pool from free device memory at pipeline build time
    # (ref paged_attention/mod.rs calculate_cache_config :91-131)
    num_pages: int | None = 512
    kv_mem_fraction: float = 0.9
    max_seqs: int = 8
    max_model_len: int = 4096
    prefill_buckets: tuple[int, ...] = (16, 64, 256, 512)
    # max sequences prefilled per batched forward (capped by max_seqs); one
    # weight stream serves the whole prompt batch (run_prefill_chunks):
    # 16x64-token prompts prefill 2.9x faster batched than sequentially
    prefill_batch: int = 16
    dtype: Any = jnp.bfloat16
    # greedy tokens generated per device dispatch (1 = classic step-per-token).
    # Host dispatch through the runtime costs ~a step itself on slow hosts;
    # the on-device argmax loop amortizes it (tokens past a stop condition
    # are discarded by the engine, like speculative overshoot).
    decode_steps: int = 8
    # fuse q/k/v and gate/up projections into wide GEMMs (quant/fuse.py,
    # measured +11% on 7B decode). Under a TP mesh the fused out axis is
    # laid out shard-interleaved (chunk s = [q_s|k_s|v_s]) so column-
    # parallel sharding needs no reshuffle (cfg.fuse_interleave).
    fuse_projections: bool = True
    kv_head_major: bool | None = None  # None = auto by max_model_len
    # int8 KV cache with per-(slot, head) f32 scales: ~2x pages in the same
    # HBM and ~half the KV stream at long-context decode, for ~1/255
    # per-element quantization error (no reference equivalent). Attention
    # takes the gather+dequant+SDPA path (Pallas pool kernels stream bf16).
    kv_quant: bool = False
    # absolute page-pool budget / context-length sizing (override
    # kv_mem_fraction; ref --pa-gpu-mem / --pa-ctxt-len)
    kv_mem_bytes: int | None = None
    kv_ctxt_len: int | None = None
    # paged attention backend: None/"default" = the dispatch zoo in
    # models/decoder.py; "ragged" = combined-pool unified kernel
    # (ops/ragged_attention.py). None falls back to MISTRALRS_ATTN_BACKEND.
    attn_backend: str | None = None


class TextPipeline:
    """Owns model params + paged cache + jitted step functions."""

    supports_multistep = True  # greedy on-device multi-token decode
    supports_topk_pack = True  # device top-K sampled-decode fast path
    # the on-device speculative loop (pipeline/speculative.py) calls
    # decoder_forward directly; subclasses with custom forward state
    # (X-LoRA dual pass) must opt out so the host spec path serves them
    supports_spec_device_loop = True
    # batched chunked prefill (run_prefill_chunks); subclasses with
    # per-sequence prefill state (vision embeds, X-LoRA dual pass) opt out
    supports_batched_prefill = True

    def __init__(
        self,
        cfg: ModelConfig,
        params: DecoderParams,
        rope: RopeTable,
        pc: PipelineConfig,
        mesh=None,
    ):
        self.cfg = cfg
        self.rope = rope
        # token ids / top-k indices round-trip through float32 in the packed
        # returns (greedy_pack, topk_pack, multistep [3,T,B]) — exact only
        # while every id fits a f32 mantissa. Fail loudly on a future
        # larger-vocab model instead of silently corrupting sampled ids.
        assert cfg.vocab_size < (1 << 24), (
            f"vocab_size {cfg.vocab_size} >= 2^24: the f32-packed device "
            "sampling fast paths would lose token-id precision")
        if pc.num_pages is None:
            from mistralrs_tpu.utils.memory import PagedCacheConfig, calculate_num_pages

            n = calculate_num_pages(
                PagedCacheConfig(mem_fraction=pc.kv_mem_fraction,
                                 mem_bytes=pc.kv_mem_bytes,
                                 context_len=pc.kv_ctxt_len,
                                 page_size=pc.page_size),
                cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                # int8 payload + f32/D per-slot scale ~= 1 byte + 4/head_dim
                dtype_bytes=(1 + 4 / cfg.head_dim) if pc.kv_quant
                else jnp.dtype(pc.dtype).itemsize,
                max_seqs=pc.max_seqs,
            )
            pc = dataclasses.replace(pc, num_pages=n)
        if cfg.is_moe and mesh is None and not cfg.moe_grouped:
            # grouped dropless dispatch off-mesh (decoder._moe_mlp_grouped):
            # validated on both backends (CPU parity suite + the tpu-marked
            # ragged_dot/gmm tests, passed on the v5e toolchain 2026-08-18),
            # so it defaults ON where lax.ragged_dot is known to lower —
            # grouped dispatch computes only the routed E/K fraction of
            # expert FLOPs. MISTRALRS_MOE_GROUPED=0 is the escape hatch
            # (mirrors the MISTRALRS_FLASH_BF16 gate) and keeps dense-vs-
            # grouped A/B possible through TextPipeline.
            import dataclasses as _dc
            import os as _os

            import jax as _jax

            if (_jax.default_backend() in ("cpu", "tpu")
                    and _os.environ.get("MISTRALRS_MOE_GROUPED") != "0"):
                cfg = _dc.replace(cfg, moe_grouped=True)
                self.cfg = cfg
        self.pc = pc
        self.mesh = mesh
        self.max_pages_per_seq = math.ceil(pc.max_model_len / pc.page_size)
        if pc.fuse_projections:
            from mistralrs_tpu.quant.fuse import fuse_decoder_params

            tp = (mesh.shape["tp"]
                  if mesh is not None and "tp" in mesh.axis_names else 1)
            if (tp == 1 or (cfg.num_heads % tp == 0
                            and cfg.num_kv_heads % tp == 0
                            and cfg.intermediate_size % tp == 0)):
                params = fuse_decoder_params(params, interleave=tp)
                if tp > 1:
                    import dataclasses as _dc

                    cfg = _dc.replace(cfg, fuse_interleave=tp)
                    self.cfg = cfg
        import os as _os2

        # q6k -> int8-per-gs requant fast lane (quant/fuse.requant_q6k_params;
        # VERDICT r4 #2 — Q6_K was the slow lane of Q4_K_M serving). The r5
        # on-chip A/B (scripts/rq8_ab, 23:05 UTC, same-window medians):
        # ffn-down GEMV 0.211 vs 0.259 ms (1.23x), lm_head 0.276 vs 0.311
        # (1.13x) — the +28% packed bytes are cheaper than the two-plane
        # unpack + 16-deep dots they replace. Quality-neutral: +0.0003 PPL
        # on top of Q6_K (PARITY.md distortion table). Default: auto-ON for
        # TPU at gs=32 (wire-Q8_0-compatible layout); "0" reverts, "64"
        # selects the larger group.
        import jax as _jax

        _rq = _os2.environ.get("MISTRALRS_Q6K_RQ8", "auto")
        if _rq == "auto":
            _rq = "32" if _jax.default_backend() == "tpu" else "0"
        if _rq not in ("", "0"):
            from mistralrs_tpu.quant.fuse import requant_q6k_params

            params = requant_q6k_params(params, gs=32 if _rq == "32" else 64)

        _ss_env = _os2.environ.get("MISTRALRS_SUPERSCAN")
        # default OFF since r5: under the split-pool + rq8 defaults the r4
        # auto-on-for-batched rule INVERTED — batch-48 measured 1099.3
        # tok/s with superscan off vs 833.8 on (scripts/batch_sweep pair,
        # 02:07-02:30 UTC; the b32 trace shows the super-group's weight xs
        # slices at 31-42 ms/aggregate). The r4 +2.9% b32 gain predates
        # both defaults. MISTRALRS_SUPERSCAN=1 forces ON.
        if _ss_env == "1":
            from mistralrs_tpu.models.superscan import superscan_decoder_params

            params = superscan_decoder_params(params)
        # KV pool layout: token-major scatters/gathers fastest at short
        # context; head-major is what the Pallas block-table decode kernel
        # streams (only engaged at span >= 4096, see _use_paged_decode_kernel)
        self.head_major = (
            pc.kv_head_major if pc.kv_head_major is not None
            else pc.max_model_len >= 4096
        )
        import os as _os

        backend = pc.attn_backend or _os.environ.get("MISTRALRS_ATTN_BACKEND")
        self.kv_combined = backend == "ragged" and not pc.kv_quant
        if backend == "ragged" and pc.kv_quant:
            import logging

            logging.getLogger(__name__).warning(
                "attn_backend=ragged is incompatible with kv_quant; serving "
                "the int8 cache over the default attention paths")
        if self.kv_combined:
            # unified ragged-paged-attention backend: interleaved K/V pool,
            # token-major by construction (ops/ragged_attention.py)
            self.head_major = False
        params, splits = self._kv_split_plan(params, mesh)
        cache = PagedKVCache.create(
            cfg.num_layers, pc.num_pages, pc.page_size, cfg.num_kv_heads,
            cfg.head_dim, pc.dtype, head_major=self.head_major,
            quant=pc.kv_quant, combined=self.kv_combined, splits=splits,
        )
        if mesh is not None:
            from mistralrs_tpu.parallel.mesh import shard_cache, shard_params

            params = shard_params(params, cfg, mesh)
            cache = shard_cache(cache, mesh)
        self.params = params
        self.cache = cache
        self._step_fn = self._build_step_fn()
        self._verify_fn = None  # built lazily (speculative decoding only)
        self._multistep_fn = None  # built lazily (greedy multi-token decode)

    def _kv_split_plan(self, params, mesh):
        """Decide the split-pool partition (VERDICT r4 #6): the remote
        compile helper dies on single arrays past ~4 GB, which made 32k
        bf16 full-model KV unservable. Auto: split per scan group whenever
        one K (or V) pool array would exceed MISTRALRS_KV_SPLIT_BYTES
        (default 3 GiB); groups too large for one part are split into
        sub-scans first (loader.split_oversized_groups). MISTRALRS_KV_SPLIT
        =1 forces ON (every group its own part — also removes the
        group-boundary pool slice/splice), =0 OFF. Mesh/combined configs
        keep the single pool (sharding specs address the full [L] axis)."""
        import os

        if mesh is not None or self.kv_combined:
            return params, None
        env = os.environ.get("MISTRALRS_KV_SPLIT", "auto")
        if env == "0":
            return params, None
        pc, cfg = self.pc, self.cfg
        bpe = 1 if pc.kv_quant else jnp.dtype(pc.dtype).itemsize
        per_layer = pc.num_pages * pc.page_size * cfg.num_kv_heads \
            * cfg.head_dim * bpe  # one K pool array layer
        limit = int(os.environ.get("MISTRALRS_KV_SPLIT_BYTES",
                                   str(3 << 30)))
        # r5 default: ON — the on-chip split_ab (23:15 UTC, same windows)
        # measured +12% plain single-stream (58.9 vs 52.5), +18% spec
        # (110.1 vs 93.0), +15% batch-16 (747.4 vs 647.4): removing the
        # group-boundary pool slice/splice pays on every serving path,
        # not just past the compile-helper array-size limit.
        from mistralrs_tpu.models.loader import split_oversized_groups

        maxl = max(1, limit // per_layer)
        params = split_oversized_groups(params, maxl)
        return params, params.group_sizes

    # ------------------------------------------------------------- jit steps
    def _build_step_fn(self):
        cfg, rope = self.cfg, self.rope
        hm = self.head_major
        mesh = self.mesh
        sp = (
            mesh.shape["sp"]
            if mesh is not None and "sp" in mesh.axis_names
            else 1
        )

        @functools.partial(jax.jit, donate_argnums=(1,), static_argnums=(9,))
        def step(params, cache, ids, positions, slot_mapping, block_tables,
                 kv_lens, active, last_idx, first_chunk=False, temps=None):
            # sequence-parallel first-chunk prefill: ring attention over the
            # mesh's sp axis when the chunk splits evenly across it
            ring = first_chunk and sp > 1 and ids.shape[1] % sp == 0
            meta = PagedAttnMeta(
                positions=positions,
                slot_mapping=slot_mapping,
                block_tables=block_tables,
                kv_lens=kv_lens,
                active=active,
                first_chunk=first_chunk,
                head_major=hm,
                ring_axis="sp" if ring else None,
                ring_mesh=mesh if ring else None,
            )
            h, cache = decoder_forward(params, cfg, rope, ids, cache, meta)
            B = ids.shape[0]
            h_last = h[jnp.arange(B), last_idx]  # [B, E]
            logits = compute_logits(params, cfg, h_last)  # [B, V] f32
            # greedy fast path rides along: fetching [2, B] instead of the
            # full logits avoids the large device->host copy per decode step
            # (ref pipeline/mod.rs:308-314 copies logits to CPU every step)
            top = jnp.argmax(logits, axis=-1)
            chosen = jnp.take_along_axis(logits, top[:, None], axis=-1)[:, 0]
            greedy_pack = jnp.stack([top.astype(jnp.float32), chosen])
            # sampled fast path: top-K of the tempered distribution + exact
            # softmax stats — the host samples from K candidates with an
            # exact tail-mass fallback (engine/sampler.sample_from_topk)
            if temps is None:
                temps = jnp.ones((B,), jnp.float32)
            y = logits / temps[:, None]
            m = jnp.max(y, axis=-1)
            z = jnp.sum(jnp.exp(y - m[:, None]), axis=-1)
            tv, ti = jax.lax.top_k(y, TOPK_PACK)
            # one [B, 2K+2] f32 pack (ti fits f32 exactly: vocab < 2^24) —
            # four separate host fetches cost 4 tunnel round-trips per
            # decode step on this host (r4 single-fetch finding)
            topk_pack = jnp.concatenate(
                [tv, ti.astype(jnp.float32), m[:, None], z[:, None]], axis=1)
            return logits, greedy_pack, topk_pack, cache

        return step

    def _build_multistep_fn(self):
        """On-device decode loop: `decode_steps` tokens per dispatch.

        The next token feeds straight back as input inside a lax.scan — no
        host round-trip per token. Slot mappings derive from the block tables
        on device; the scheduler reserves `decode_steps` lookahead slots, and
        the engine discards overshoot past stop conditions
        (ref: removes the per-step logits->CPU sync, pipeline/mod.rs:308).

        sampled=False: pure argmax feedback (greedy batches).
        sampled=True: reference-exact device sampling — per-row temperature,
        top-k (k <= TOPK_PACK, exact because the truncation set lives inside
        the pack), top-p cut (cumsum-before >= p), min-p, then a Gumbel draw
        over the kept unnormalized probs (== multinomial over kept/total);
        greedy rows ride along as (temp=1, k=1). Probabilities use the
        full-vocab softmax normalizer, so they match engine/sampler.Sampler
        exactly; only the RNG stream differs (jax PRNG vs numpy)."""
        cfg, rope = self.cfg, self.rope
        ps = self.pc.page_size
        T = self.pc.decode_steps
        hm = self.head_major

        @functools.partial(jax.jit, donate_argnums=(1,), static_argnums=(8,))
        def multistep(params, cache, ids, kv_lens, block_tables, active,
                      pos_off, sample_args, sampled=False):
            # kv_lens/tables may be window-relative (sliced from the window
            # base); pos_off restores absolute positions for rope. Slot
            # page-index arithmetic is base-invariant: (kvl+off)//ps - base
            # == kvl//ps since off = base*ps.
            def body(carry, _):
                ids, kvl, cache, key = carry
                pos = kvl[:, None]  # [B, 1] window-relative
                page = jnp.take_along_axis(block_tables, pos // ps, axis=1)
                slot = page * ps + pos % ps
                meta = PagedAttnMeta(
                    positions=pos + pos_off[:, None],
                    slot_mapping=slot,
                    block_tables=block_tables,
                    kv_lens=kvl + 1,
                    active=active,
                    head_major=hm,
                )
                h, cache = decoder_forward(params, cfg, rope, ids[:, None], cache, meta)
                logits = compute_logits(params, cfg, h[:, 0])  # [B, V]
                if not sampled:
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    chosen = jnp.take_along_axis(logits, nxt[:, None], axis=-1)[:, 0]
                    return (nxt, kvl + 1, cache, key), (nxt, chosen, chosen)
                temps, kk, pp, minp = sample_args
                y = logits / temps[:, None]
                tv, ti = jax.lax.top_k(y, TOPK_PACK)  # [B, K] desc
                m = jnp.max(y, axis=-1, keepdims=True)
                z = jnp.sum(jnp.exp(y - m), axis=-1, keepdims=True)
                probs = jnp.exp(tv - m) / z  # exact (full-vocab normalizer)
                j = jnp.arange(TOPK_PACK)[None]
                keep = j < kk[:, None]  # top-k
                kept = jnp.where(keep, probs, 0.0)
                cums = jnp.cumsum(kept, axis=-1)
                topp_on = (pp[:, None] > 0.0) & (pp[:, None] < 1.0)
                keep &= jnp.where(topp_on, (cums - kept) < pp[:, None], True)
                kept = jnp.where(keep, probs, 0.0)
                # min-p nests inside the top-p branch (ref sampler.rs order);
                # row 0 is always kept, so kept[:, :1] is the max prob
                minp_on = topp_on & (minp[:, None] > 0.0) & (minp[:, None] < 1.0)
                keep &= jnp.where(minp_on, kept > kept[:, :1] * minp[:, None], True)
                kept = jnp.where(keep, probs, 0.0)
                key, sub = jax.random.split(key)
                u = jax.random.uniform(sub, tv.shape)
                g = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
                zz = jnp.where(keep, jnp.log(jnp.maximum(kept, 1e-45)) + g, -jnp.inf)
                idx = jnp.argmax(zz, axis=-1)
                nxt = jnp.take_along_axis(ti, idx[:, None], axis=1)[:, 0].astype(jnp.int32)
                chosen = jnp.take_along_axis(kept, idx[:, None], axis=1)[:, 0]
                total = jnp.sum(kept, axis=-1)
                # ref sample_multinomial: log10 of the unnormalized kept prob
                lp10 = jnp.where(total > 0.0,
                                 jnp.log10(jnp.maximum(chosen, 1e-45)), 0.0)
                raw = jnp.take_along_axis(logits, nxt[:, None], axis=1)[:, 0]
                return (nxt, kvl + 1, cache, key), (nxt, raw, lp10)

            key0 = jax.random.PRNGKey(sample_args[4] if sampled else 0)
            if sampled:
                sample_args = tuple(sample_args[:4])
            (_, _, cache, _), (toks, raws, lps) = jax.lax.scan(
                body, (ids, kv_lens, cache, key0), None, length=T
            )
            # ONE stacked return: the caller fetches a single [3, T, B]
            # array — three separate np.asarray fetches cost 3 tunnel/host
            # round-trips per dispatch (r4: each RTT is 20-50 ms on this
            # host, ~2-6 ms/step at batch 32)
            pack = jnp.stack([toks.astype(jnp.float32), raws, lps])
            return pack, cache

        return multistep

    def run_decode_multi(self, seqs: list[Sequence], sampling=None) -> np.ndarray:
        """Multi-token decode: returns pack [3, T, n] = (token ids, raw logit
        of the token, log10 unnormalized kept prob — meaningful only with
        `sampling`). Advances each seq's kv_len by decode_steps; the caller
        rewinds via kv_len when it consumes fewer (stop conditions).

        sampling: None for pure-greedy batches, else
        (temps [n], top_ks [n], top_ps [n], min_ps [n], seed)."""
        if self._multistep_fn is None:
            self._multistep_fn = self._build_multistep_fn()
        B = self.pc.max_seqs
        T = self.pc.decode_steps
        n = len(seqs)
        ps = self.pc.page_size
        bases = [self._window_base_pages(s.kv_len) for s in seqs]
        width = self._table_width(seqs, T, bases)
        ids = np.zeros((B,), np.int32)
        kv_lens = np.zeros((B,), np.int32)
        pos_off = np.zeros((B,), np.int32)
        block_tables = np.zeros((B, width), np.int32)
        active = np.zeros((B,), np.float32)
        for i, (seq, base) in enumerate(zip(seqs, bases)):
            ids[i] = seq.tokens[-1]
            # masks/tables run window-relative; rope gets absolute positions
            # back via pos_off (see _window_base_pages)
            kv_lens[i] = seq.kv_len - base * ps
            pos_off[i] = base * ps
            block_tables[i] = self._tables_row(seq, width, base)
            active[i] = 1.0
        if sampling is None:
            sample_args = None
        else:
            temps, kks, pps, minps, seed = sampling
            pad = lambda a, fill: np.concatenate(  # noqa: E731
                [np.asarray(a), np.full(B - n, fill, np.asarray(a).dtype)])
            sample_args = (
                jnp.asarray(pad(np.asarray(temps, np.float32), 1.0)),
                jnp.asarray(pad(np.asarray(kks, np.int32), 1)),
                jnp.asarray(pad(np.asarray(pps, np.float32), 1.0)),
                jnp.asarray(pad(np.asarray(minps, np.float32), 0.0)),
                jnp.asarray(seed, jnp.uint32),
            )
        pack, self.cache = self._multistep_fn(
            self.params, self.cache,
            jnp.asarray(ids), jnp.asarray(kv_lens), jnp.asarray(block_tables),
            jnp.asarray(active), jnp.asarray(pos_off), sample_args,
            sampling is not None,
        )
        for seq in seqs:
            seq.kv_len += T
        return np.asarray(pack, np.float32)[:, :, :n]

    def _build_verify_fn(self):
        """Like the step fn but returns logits at *every* fed position —
        the target-model pass of speculative decoding scores all gamma
        draft tokens plus the bonus position in one MXU-friendly batched
        call (ref speculative.rs :419-487)."""
        cfg, rope = self.cfg, self.rope
        hm = self.head_major

        @functools.partial(jax.jit, donate_argnums=(1,))
        def verify(params, cache, ids, positions, slot_mapping, block_tables, kv_lens, active):
            meta = PagedAttnMeta(
                positions=positions,
                slot_mapping=slot_mapping,
                block_tables=block_tables,
                kv_lens=kv_lens,
                active=active,
                head_major=hm,
            )
            h, cache = decoder_forward(params, cfg, rope, ids, cache, meta)
            logits = compute_logits(params, cfg, h)  # [B, W, V] f32
            top = jnp.argmax(logits, axis=-1)  # [B, W]
            chosen = jnp.take_along_axis(logits, top[..., None], axis=-1)[..., 0]
            pack = jnp.stack([top.astype(jnp.float32), chosen])  # [2, B, W]
            return logits, pack, cache

        return verify

    def _verify(self, ids, positions, slot_mapping, block_tables, kv_lens,
                active):
        """The all-positions forward of run_span (speculative target verify);
        subclasses with extra cache state override (lora/xlora.py)."""
        if self._verify_fn is None:
            self._verify_fn = self._build_verify_fn()
        logits, pack, self.cache = self._verify_fn(
            self.params, self.cache,
            jnp.asarray(ids), jnp.asarray(positions), jnp.asarray(slot_mapping),
            jnp.asarray(block_tables), jnp.asarray(kv_lens), jnp.asarray(active),
        )
        return logits, pack

    def run_span(
        self,
        rows: list[tuple[list[int], int, np.ndarray]],
        width: int,
        *,
        all_positions: bool = False,
        greedy: bool = False,
    ):
        """Batched multi-token feed: row = (tokens, start_pos, block_table_row);
        row tokens are written to the KV cache at positions start_pos.. and
        attended causally. With all_positions=True returns logits at every fed
        position (target verify); otherwise only at each row's last real
        position (draft steps / catch-up). No Sequence state is mutated.
        """
        B = self.pc.max_seqs
        n = len(rows)
        assert n <= B
        W = width
        ps = self.pc.page_size
        bases = [self._window_base_pages(start) for _, start, _ in rows]
        tw = self._width_for_tokens(max(
            start + W - b * ps for (_, start, _), b in zip(rows, bases)
        ))
        ids = np.zeros((B, W), np.int32)
        positions = np.zeros((B, W), np.int32)
        slot_mapping = np.zeros((B, W), np.int32)  # page-0 garbage for padding
        block_tables = np.zeros((B, tw), np.int32)
        kv_lens = np.ones((B,), np.int32)
        active = np.zeros((B,), np.float32)
        last_idx = np.zeros((B,), np.int32)
        for i, ((toks, start, table_row), base) in enumerate(zip(rows, bases)):
            m = len(toks)
            assert 0 < m <= W
            ids[i, :m] = toks
            positions[i, :m] = np.arange(start, start + m)
            slot_mapping[i, :m] = self._slots(table_row, start, m)
            sl = table_row[base : base + tw]
            block_tables[i, : len(sl)] = sl
            # padded-width trick (see run_prefill_chunk): q_offset = kv_lens - W;
            # kv_lens/tables window-relative for window models
            kv_lens[i] = start + W - base * ps
            active[i] = 1.0
            last_idx[i] = m - 1
        if all_positions:
            logits, pack = self._verify(ids, positions, slot_mapping,
                                        block_tables, kv_lens, active)
            if greedy:
                return np.asarray(pack)[:, :n]
            return np.asarray(logits)[:n]
        logits = self._run(ids, positions, slot_mapping, block_tables, kv_lens, active, last_idx)
        if greedy:
            return np.asarray(self.last_greedy_pack)[:, :n]
        return np.asarray(logits)[:n]

    def re_isq(self, ggml_type: str) -> None:
        """Runtime re-quantization of every linear to `ggml_type` (ref
        pipeline/isq.rs quantize + the /re_isq route). Weights are
        dequantized through their own forward (identity input — exact) and
        re-packed; step functions rebuild, so the next step recompiles.
        MUST run on the engine thread (EngineHandle.run_control) — it
        mutates params under the step loop."""
        from mistralrs_tpu.models.loader import _maybe_quantize, group_layers
        from mistralrs_tpu.quant.isq import parse_isq
        from mistralrs_tpu.quant.qlinear import Linear, linear

        gtype = parse_isq(ggml_type)
        is_lin = lambda x: isinstance(x, Linear)

        def requant(lin: Linear) -> Linear:
            if not isinstance(lin, Linear) or lin.kind == "lora":
                return lin  # adapter banks stay; base requant would detach them
            in_f, out_f = lin.shape
            b = lin.data.get("b")
            eye = jnp.eye(in_f, dtype=jnp.float32)
            w = np.asarray(linear(lin, eye), np.float32)  # [in, out]
            if b is not None:
                b = np.asarray(b, np.float32)
                w = w - b[None, :]
            q = _maybe_quantize(np.ascontiguousarray(w.T), b, gtype, self.pc.dtype)
            if q is None:  # not quantizable at this shape: keep dense
                data = {"w": jnp.asarray(w, self.pc.dtype)}
                if b is not None:
                    data["b"] = jnp.asarray(b, self.pc.dtype)
                return Linear(kind="dense", shape=lin.shape, data=data, meta=None)
            return q

        def take_layer(leaf, i):
            """Leaf of a STACKED group (Linear with leading [L] data axes,
            or a bare [L, ...] array) -> that layer's unstacked leaf."""
            if isinstance(leaf, Linear):
                return Linear(kind=leaf.kind, shape=leaf.shape,
                              data={k: v[i] for k, v in leaf.data.items()},
                              meta=leaf.meta)
            return leaf[i]

        # per-layer requant needs UNSTACKED Linears: rebuild layer dicts,
        # requant each Linear leaf, then regroup (kinds may change -> new
        # scan groups)
        layers = []
        for group, size in zip(self.params.layer_groups,
                               self.params.group_sizes):
            if isinstance(group, (list, tuple)):
                # super-group (models/superscan.py): expand back to
                # per-layer dicts first
                from mistralrs_tpu.models.superscan import expand_supergroup

                for lp in expand_supergroup(list(group), size):
                    layers.append(jax.tree.map(requant, lp, is_leaf=is_lin))
                continue
            for i in range(size):
                lp = jax.tree.map(lambda leaf, i=i: take_layer(leaf, i),
                                  group, is_leaf=is_lin)
                layers.append(jax.tree.map(requant, lp, is_leaf=is_lin))
        groups, sizes = group_layers(layers)
        lm_head = (None if self.params.lm_head is None
                   else requant(self.params.lm_head))
        self.params = dataclasses.replace(
            self.params, layer_groups=groups, group_sizes=sizes,
            lm_head=lm_head)
        if getattr(self.cache, "is_split", False):
            # regroup changed the scan partition: re-plan and re-partition
            # the split pool (content preserved — seqs keep serving)
            from mistralrs_tpu.ops.paged_attention import resplit_cache

            self.params, splits = self._kv_split_plan(self.params, self.mesh)
            self.cache = resplit_cache(self.cache, splits)
        if self.mesh is not None:
            from mistralrs_tpu.parallel.mesh import shard_params

            self.params = shard_params(self.params, self.cfg, self.mesh)
        # step functions capture nothing about kinds, but jit caches key on
        # pytree structure — rebuilding keeps the cache small after regroup
        self._step_fn = self._build_step_fn()
        self._verify_fn = None
        self._multistep_fn = None

    def apply_copies(self, ops: list[tuple[int, int]]) -> None:
        """COW page copies (ref cache_engine.rs copy :205)."""
        from mistralrs_tpu.ops.paged_attention import copy_pages

        self.cache = copy_pages(
            self.cache, [s for s, _ in ops], [d for _, d in ops]
        )

    def _run(self, ids, positions, slot_mapping, block_tables, kv_lens, active,
             last_idx, first_chunk: bool = False, temps=None):
        logits, greedy_pack, topk_pack, self.cache = self._step_fn(
            self.params,
            self.cache,
            jnp.asarray(ids),
            jnp.asarray(positions),
            jnp.asarray(slot_mapping),
            jnp.asarray(block_tables),
            jnp.asarray(kv_lens),
            jnp.asarray(active),
            jnp.asarray(last_idx),
            first_chunk,
            None if temps is None else jnp.asarray(temps),
        )
        self.last_greedy_pack = greedy_pack  # device array; fetched on demand
        self.last_topk_pack = topk_pack
        self.last_logits = logits
        return logits

    # ------------------------------------------------------------- helpers
    def _tables_row(self, seq: Sequence, width: int | None = None,
                    base: int = 0) -> np.ndarray:
        width = width or self.max_pages_per_seq
        row = np.zeros(width, np.int32)
        bt = seq.block_table[base : base + width]
        row[: len(bt)] = bt
        return row

    def _window_base_pages(self, kv_len: int) -> int:
        """Whole pages strictly behind the sliding window: attention can
        skip them entirely when EVERY layer is windowed (pattern "all" —
        mistral/phi3 style). The decode paths pass the table sliced from
        this base with *virtual* kv_lens (absolute rope positions ride in
        `positions`), so long-context decode never gathers dead history —
        the paged equivalent of the reference's sliding-window KV truncation
        (cache_manager.rs:101-154)."""
        w = self.cfg.sliding_window
        if w is None or self.cfg.sliding_window_pattern != "all":
            return 0
        return max(0, kv_len - w) // self.pc.page_size

    def _table_width(self, seqs: list[Sequence], lookahead: int,
                     bases: list[int] | None = None) -> int:
        """Page-bucketed block-table width covering every row's context span
        plus `lookahead` tokens about to be written (minus each row's
        behind-the-window base when `bases` is given).

        Decode attention streams the whole static table span per row (gather
        path) — padding the tables to max_model_len makes batched decode
        KV-bandwidth-bound on padding (e.g. 16 rows x 2048-token span = 4.3GB
        of mostly-dead gather per step at 7B shapes, vs the 3.9GB weight
        stream). Power-of-two page buckets keep the set of compiled step-fn
        variants small while the gather only touches the live span."""
        bases = bases or [0] * len(seqs)
        ps = self.pc.page_size
        return self._width_for_tokens(max(
            s.kv_len + lookahead - b * ps for s, b in zip(seqs, bases)
        ))

    def _width_for_tokens(self, need_tok: int) -> int:
        need = -(-need_tok // self.pc.page_size)
        w = 4
        while w < need:
            w *= 2
        return min(w, self.max_pages_per_seq)

    def _slot(self, seq: Sequence, pos: int) -> int:
        page = seq.block_table[pos // self.pc.page_size]
        return page * self.pc.page_size + pos % self.pc.page_size

    def _slots(self, table, start: int, m: int) -> np.ndarray:
        """Vectorized flat slots for positions start..start+m over a block
        table (list or array) — the per-token Python loop is measurable on
        this 1-core host at batch x 512-token chunks."""
        ps = self.pc.page_size
        pos = np.arange(start, start + m)
        table = np.asarray(table, np.int32)
        return table[pos // ps] * ps + pos % ps

    # ------------------------------------------------------------- decode
    def run_decode(self, seqs: list[Sequence], greedy: bool = False,
                   mode: str | None = None) -> np.ndarray:
        """One decode token for each seq.

        mode: "full" (default) returns logits [n, V]; "greedy" the fused
        argmax pack [2, n]; "topk" the device top-K sampling pack
        (tv [n,K], ti [n,K], m [n], z [n]) — small fetches instead of the
        full logits."""
        mode = mode or ("greedy" if greedy else "full")
        B = self.pc.max_seqs
        assert len(seqs) <= B
        ps = self.pc.page_size
        bases = [self._window_base_pages(s.kv_len) for s in seqs]
        width = self._table_width(seqs, 1, bases)
        ids = np.zeros((B, 1), np.int32)
        positions = np.zeros((B, 1), np.int32)
        slot_mapping = np.zeros((B, 1), np.int32)  # page-0 garbage for padding
        block_tables = np.zeros((B, width), np.int32)
        kv_lens = np.ones((B,), np.int32)  # 1 for padding rows: avoids NaN rows
        active = np.zeros((B,), np.float32)
        temps = np.ones((B,), np.float32)
        for i, (seq, base) in enumerate(zip(seqs, bases)):
            pos = seq.kv_len
            ids[i, 0] = seq.tokens[-1]
            positions[i, 0] = pos  # absolute (rope)
            slot_mapping[i, 0] = self._slot(seq, pos)
            block_tables[i] = self._tables_row(seq, width, base)
            # masks run on window-relative ids (see _window_base_pages)
            kv_lens[i] = pos + 1 - base * ps
            active[i] = 1.0
            if seq.sampling.temperature is not None:
                temps[i] = seq.sampling.temperature
        last_idx = np.zeros((B,), np.int32)
        logits = self._run(ids, positions, slot_mapping, block_tables, kv_lens,
                           active, last_idx, temps=temps)
        for seq in seqs:
            seq.kv_len += 1
        n = len(seqs)
        if mode == "greedy":
            return np.asarray(self.last_greedy_pack)[:, :n]
        if mode == "topk":
            p = np.asarray(self.last_topk_pack)  # [B, 2K+2] — ONE fetch
            K = TOPK_PACK
            tv, ti, m, z = (p[:, :K], p[:, K : 2 * K].astype(np.int32),
                            p[:, 2 * K], p[:, 2 * K + 1])
            return (np.asarray(tv)[:n], np.asarray(ti)[:n],
                    np.asarray(m)[:n], np.asarray(z)[:n])
        return np.asarray(logits)[:n]

    def fetch_full_logits_row(self, i: int) -> np.ndarray:
        """Fallback: full-vocab logits of row i from the last decode step."""
        return np.asarray(self.last_logits[i])

    # ------------------------------------------------------------- prefill
    def run_prefill_chunk(
        self, seq: Sequence, chunk: list[int], greedy: bool = False,
        advance_state: bool = True,
    ) -> np.ndarray:
        """Prefill `chunk` tokens (continuing at seq.prefill_done_tokens).

        Returns logits [V] at the last chunk position (meaningful only for
        the final chunk); with greedy=True, the [2] fused-argmax pack.
        Ref: make_prompt_chunk / prompt_batchsize chunking
        (inputs_processor.rs:111-260).
        """
        T = _next_bucket(len(chunk), self.pc.prefill_buckets)
        start = seq.prefill_done_tokens
        n = len(chunk)
        ids = np.zeros((1, T), np.int32)
        ids[0, :n] = chunk
        positions = np.zeros((1, T), np.int32)
        positions[0, :n] = np.arange(start, start + n)
        slot_mapping = np.zeros((1, T), np.int32)
        slot_mapping[0, :n] = self._slots(seq.block_table, start, n)
        # window models: slice the table from the window base of the chunk's
        # OLDEST query (start); masks are shift-invariant, rope rides on the
        # absolute `positions` (see _window_base_pages)
        base = self._window_base_pages(start)
        block_tables = self._tables_row(
            seq, self._width_for_tokens(start + T - base * self.pc.page_size),
            base,
        )[None]
        # The decoder derives q_offset as kv_lens - T; with the chunk padded
        # from n to T, pass start + T so real queries get q_pos = start + j.
        # Causal masking keeps them within the valid kv range regardless.
        kv_lens = np.asarray([start + T - base * self.pc.page_size], np.int32)
        active = np.ones((1,), np.float32)
        last_idx = np.asarray([n - 1], np.int32)
        logits = self._run(ids, positions, slot_mapping, block_tables, kv_lens,
                           active, last_idx, first_chunk=(start == 0))
        if advance_state:
            seq.prefill_done_tokens = start + n
            seq.kv_len = start + n
        if greedy:
            return np.asarray(self.last_greedy_pack)[:, 0]
        return np.asarray(logits)[0]

    def run_prefill_chunks(self, items: list[tuple[Sequence, list[int]]]) -> None:
        """Batched chunked prefill: one forward serves several prefilling
        sequences, amortizing the full weight stream across prompts (the
        reference batches prompt sequences the same way:
        default_scheduler + make_prompt_chunk, inputs_processor.rs:111-260).

        items: (seq, chunk) rows; chunks may differ in length and start
        (row padding writes to the reserved page-0 scratch slots). Leaves
        the greedy pack / logits on device; callers fetch per row via
        `last_greedy_pack` / `fetch_full_logits_row`.
        """
        n = len(items)
        B = self.pc.max_seqs  # one padded batch shape per chunk bucket
        assert 0 < n <= B
        T = _next_bucket(max(len(c) for _, c in items), self.pc.prefill_buckets)
        first = all(s.prefill_done_tokens == 0 for s, _ in items)
        ps = self.pc.page_size
        bases = [self._window_base_pages(s.prefill_done_tokens) for s, _ in items]
        width = self._width_for_tokens(max(
            s.prefill_done_tokens + T - b * ps for (s, _), b in zip(items, bases)
        ))
        ids = np.zeros((B, T), np.int32)
        positions = np.zeros((B, T), np.int32)
        slot_mapping = np.zeros((B, T), np.int32)  # page-0 garbage for padding
        block_tables = np.zeros((B, width), np.int32)
        kv_lens = np.ones((B,), np.int32)
        active = np.zeros((B,), np.float32)
        last_idx = np.zeros((B,), np.int32)
        for i, ((seq, chunk), base) in enumerate(zip(items, bases)):
            start = seq.prefill_done_tokens
            m = len(chunk)
            ids[i, :m] = chunk
            positions[i, :m] = np.arange(start, start + m)
            slot_mapping[i, :m] = self._slots(seq.block_table, start, m)
            block_tables[i] = self._tables_row(seq, width, base)
            # padded-width trick (see run_prefill_chunk); kv_lens/tables are
            # window-relative for window models (see _window_base_pages)
            kv_lens[i] = start + T - base * ps
            active[i] = 1.0
            last_idx[i] = m - 1
        self._run(ids, positions, slot_mapping, block_tables, kv_lens,
                  active, last_idx, first_chunk=first)
        for seq, chunk in items:
            seq.prefill_done_tokens += len(chunk)
            seq.kv_len = seq.prefill_done_tokens
