"""X-LoRA: mixture-of-adapters with a learned per-token scaling classifier.

Reference parity: mistralrs-core/src/xlora_models/ —
`XLoraClassifier` (classifier.rs:22-319: depth-configurable MLP over the
scaling pass's hidden states producing per-token/layer/adapter scalings,
optional softmax + temperature, top-k sparsification, global scaling
weight), `ScalingsMaker::get_scalings` dual-pass driver (mod.rs:40-60),
and `XLoraConfig` (config knobs incl. `scaling_pass_value`,
`layerwise_scalings`, `global_scaling_weight`).

TPU design: the reference runs two separate model forwards with different
cache vectors; here both passes live inside ONE jitted step — pass 1 runs
with constant `scaling_pass_value` scalings against a second paged KV cache
(same page-id space as the main cache, like the speculative draft), the
classifier MLP maps its hidden states to scalings, and pass 2 consumes them.
XLA fuses the classifier into the step; adapter swap stays recompile-free.
"""

from __future__ import annotations

import dataclasses
import functools
import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mistralrs_tpu.models.decoder import compute_logits, decoder_forward
from mistralrs_tpu.ops.paged_attention import PagedAttnMeta, PagedKVCache
from mistralrs_tpu.pipeline.text import TextPipeline
from mistralrs_tpu.quant.qlinear import Linear, linear, make_dense


@dataclasses.dataclass
class XLoraConfig:
    """Ref xlora_models/config.rs XLoraConfig fields we honor."""

    hidden_size: int  # classifier width (base model E if depth==1)
    xlora_depth: int = 1
    enable_softmax: bool = True
    softmax_temperature: float = 1.0
    layerwise_scalings: bool = True
    global_scaling_weight: float = 1.0
    scaling_pass_value: float = 0.0
    top_k_lora: int | None = None
    # after this many generated tokens, freeze per-seq scalings and skip the
    # scaling pass during decode (ref xlora_models/mod.rs NonGranularState
    # :35-38 — trades per-token granularity for a single-pass decode)
    tgt_non_granular_index: int | None = None

    @classmethod
    def from_json_file(cls, path: str) -> "XLoraConfig":
        with open(path) as f:
            d = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def make_classifier(
    rng: np.random.Generator,
    model_dim: int,
    num_layers: int,
    n_adapters: int,
    xcfg: XLoraConfig,
    dtype=jnp.float32,
) -> dict[str, Any]:
    """Random-init classifier (ref classifier.rs new: inner stack + last)."""
    out_dim = num_layers * n_adapters if xcfg.layerwise_scalings else n_adapters

    def dense(i, o):
        w = (rng.standard_normal((i, o)) * 0.02).astype(np.float32)
        return make_dense(jnp.asarray(w, dtype), jnp.zeros((o,), dtype))

    inner = []
    if xcfg.xlora_depth == 1:
        last = dense(model_dim, out_dim)
    else:
        inner.append(dense(model_dim, xcfg.hidden_size))
        for _ in range(xcfg.xlora_depth - 2):
            inner.append(dense(xcfg.hidden_size, xcfg.hidden_size))
        last = dense(xcfg.hidden_size, out_dim)
    return {"inner": inner, "last": last}


def classifier_from_safetensors(path: str, dtype=jnp.float32) -> dict[str, Any]:
    """Load xlora_classifier.safetensors (torch Linear layout: (out, in))."""
    from safetensors import safe_open

    layers: dict[int, dict[str, np.ndarray]] = {}
    last: dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as h:
        for key in h.keys():
            t = h.get_tensor(key)
            parts = key.split(".")
            if "last" in parts:
                last["w" if parts[-1] == "weight" else "b"] = t
            else:
                nums = [p for p in parts if p.isdigit()]
                idx = int(nums[0]) if nums else 0
                d = layers.setdefault(idx, {})
                d["w" if parts[-1] == "weight" else "b"] = t

    def to_lin(d):
        w = jnp.asarray(np.ascontiguousarray(d["w"].T), dtype)
        b = jnp.asarray(d["b"], dtype) if "b" in d else None
        return make_dense(w, b)

    inner = [to_lin(layers[i]) for i in sorted(layers)]
    return {"inner": inner, "last": to_lin(last)}


def classifier_forward(
    clf: dict[str, Any],
    xcfg: XLoraConfig,
    h: jax.Array,  # [B, T, E]
    num_layers: int,
    n_adapters: int,
) -> jax.Array:
    """hidden states -> scalings [B, T, L, n] (ref classifier.rs forward)."""
    x = h
    for lin in clf["inner"]:
        x = jax.nn.relu(linear(lin, x))
    logits = linear(clf["last"], x).astype(jnp.float32)  # [B, T, out]
    B, T, _ = logits.shape
    if xcfg.layerwise_scalings:
        scal = logits.reshape(B, T, num_layers, n_adapters)
    else:
        scal = jnp.broadcast_to(
            logits[:, :, None, :], (B, T, num_layers, n_adapters)
        )
    if xcfg.top_k_lora is not None and xcfg.top_k_lora < n_adapters:
        thresh = jax.lax.top_k(scal, xcfg.top_k_lora)[0][..., -1:]
        scal = jnp.where(scal >= thresh, scal, -jnp.inf if xcfg.enable_softmax else 0.0)
    if xcfg.enable_softmax:
        scal = jax.nn.softmax(scal / xcfg.softmax_temperature, axis=-1)
    return scal * xcfg.global_scaling_weight


class XLoraPipeline(TextPipeline):
    """Dual-pass X-LoRA pipeline: pass 1 (scaling_pass_value scalings, own KV
    cache) -> classifier -> pass 2 (real scalings, main KV cache). Both paged
    caches share the block table / page-id space."""
    supports_batched_prefill = False  # per-seq prefill state

    supports_multistep = False  # dual-pass step fn; multi-token loop n/a
    supports_topk_pack = False  # custom step fn without the top-K outputs
    supports_spec_device_loop = False  # spec loop bypasses the dual pass

    def __init__(self, cfg, params, rope, pc, classifier, xcfg: XLoraConfig,
                 n_adapters: int, mesh=None):
        self.clf = classifier
        self.xcfg = xcfg
        self.n_adapters = n_adapters
        self._frozen_fn = None
        self._current_seqs = None
        super().__init__(cfg, params, rope, pc, mesh=mesh)
        self.cache2 = PagedKVCache.create(
            cfg.num_layers, pc.num_pages, pc.page_size, cfg.num_kv_heads,
            cfg.head_dim, pc.dtype, head_major=self.head_major,
            quant=pc.kv_quant,
        )
        if mesh is not None:
            from mistralrs_tpu.parallel.mesh import shard_cache

            self.cache2 = shard_cache(self.cache2, mesh)

    def _build_step_fn(self):
        cfg, rope, xcfg, n = self.cfg, self.rope, self.xcfg, self.n_adapters
        L = cfg.num_layers
        hm = self.head_major

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def step(params, clf, cache, cache2, ids, positions, slot_mapping,
                 block_tables, kv_lens, active, last_idx):
            meta = PagedAttnMeta(
                positions=positions, slot_mapping=slot_mapping,
                block_tables=block_tables, kv_lens=kv_lens, active=active,
                head_major=hm,
            )
            B, T = ids.shape
            dummy = jnp.full((B, T, L, n), xcfg.scaling_pass_value, jnp.float32)
            h1, cache2 = decoder_forward(
                params, cfg, rope, ids, cache2, meta, xlora_scalings=dummy
            )
            scal = classifier_forward(clf, xcfg, h1, L, n)
            h, cache = decoder_forward(
                params, cfg, rope, ids, cache, meta, xlora_scalings=scal
            )
            h_last = h[jnp.arange(B), last_idx]
            logits = compute_logits(params, cfg, h_last)
            top = jnp.argmax(logits, axis=-1)
            chosen = jnp.take_along_axis(logits, top[:, None], axis=-1)[:, 0]
            greedy_pack = jnp.stack([top.astype(jnp.float32), chosen])
            # last real position's scalings, for the non-granular cache
            last_scal = scal[jnp.arange(B), last_idx]  # [B, L, n]
            return logits, greedy_pack, cache, cache2, last_scal

        return step

    def _build_frozen_step_fn(self):
        """Single-pass decode with frozen per-seq scalings (NonGranularState)."""
        cfg, rope = self.cfg, self.rope
        hm = self.head_major

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, cache, scal, ids, positions, slot_mapping,
                 block_tables, kv_lens, active, last_idx):
            meta = PagedAttnMeta(
                positions=positions, slot_mapping=slot_mapping,
                block_tables=block_tables, kv_lens=kv_lens, active=active,
                head_major=hm,
            )
            B, T = ids.shape
            scal_t = jnp.broadcast_to(scal[:, None], (B, T, *scal.shape[1:]))
            h, cache = decoder_forward(
                params, cfg, rope, ids, cache, meta, xlora_scalings=scal_t
            )
            h_last = h[jnp.arange(B), last_idx]
            logits = compute_logits(params, cfg, h_last)
            top = jnp.argmax(logits, axis=-1)
            chosen = jnp.take_along_axis(logits, top[:, None], axis=-1)[:, 0]
            return logits, jnp.stack([top.astype(jnp.float32), chosen]), cache

        return step

    def _run(self, ids, positions, slot_mapping, block_tables, kv_lens, active,
             last_idx, first_chunk: bool = False, temps=None):
        seqs = getattr(self, "_current_seqs", None)
        ng = self.xcfg.tgt_non_granular_index
        if ng is not None and seqs is not None and all(
            getattr(s, "xlora_scalings", None) is not None
            and s.num_generated >= ng
            for s in seqs
        ):
            # frozen-scalings single-pass decode (ref NonGranularState)
            if self._frozen_fn is None:
                self._frozen_fn = self._build_frozen_step_fn()
            B = ids.shape[0]
            scal = np.zeros((B, self.cfg.num_layers, self.n_adapters), np.float32)
            for i, s in enumerate(seqs):
                scal[i] = s.xlora_scalings
            logits, pack, self.cache = self._frozen_fn(
                self.params, self.cache, jnp.asarray(scal),
                jnp.asarray(ids), jnp.asarray(positions), jnp.asarray(slot_mapping),
                jnp.asarray(block_tables), jnp.asarray(kv_lens), jnp.asarray(active),
                jnp.asarray(last_idx),
            )
            self.last_greedy_pack = pack
            return logits
        logits, pack, self.cache, self.cache2, last_scal = self._step_fn(
            self.params, self.clf, self.cache, self.cache2,
            jnp.asarray(ids), jnp.asarray(positions), jnp.asarray(slot_mapping),
            jnp.asarray(block_tables), jnp.asarray(kv_lens), jnp.asarray(active),
            jnp.asarray(last_idx),
        )
        self.last_greedy_pack = pack
        if ng is not None and seqs is not None:
            scal_np = np.asarray(last_scal)
            for i, s in enumerate(seqs):
                s.xlora_scalings = scal_np[i]
        return logits

    def run_decode(self, seqs, greedy=False):
        self._current_seqs = seqs
        try:
            return super().run_decode(seqs, greedy=greedy)
        finally:
            self._current_seqs = None

    def run_prefill_chunk(self, seq, chunk, greedy=False, advance_state=True):
        self._current_seqs = [seq]
        try:
            return super().run_prefill_chunk(seq, chunk, greedy=greedy,
                                             advance_state=advance_state)
        finally:
            self._current_seqs = None

    def apply_copies(self, ops):
        from mistralrs_tpu.ops.paged_attention import copy_pages

        src = [s for s, _ in ops]
        dst = [d for _, d in ops]
        for attr in ("cache", "cache2"):
            setattr(self, attr, copy_pages(getattr(self, attr), src, dst))

    def _build_verify_fn(self):
        """All-positions dual-pass forward: the X-LoRA target's speculative
        verify (scaling pass on cache2, then the real pass), returning
        logits at every fed position (ref speculative.rs target step over an
        XLora pipeline; TextPipeline._build_verify_fn is the plain case)."""
        cfg, rope, xcfg, n = self.cfg, self.rope, self.xcfg, self.n_adapters
        L = cfg.num_layers
        hm = self.head_major

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def verify(params, clf, cache, cache2, ids, positions, slot_mapping,
                   block_tables, kv_lens, active):
            meta = PagedAttnMeta(
                positions=positions, slot_mapping=slot_mapping,
                block_tables=block_tables, kv_lens=kv_lens, active=active,
                head_major=hm,
            )
            B, W = ids.shape
            dummy = jnp.full((B, W, L, n), xcfg.scaling_pass_value, jnp.float32)
            h1, cache2 = decoder_forward(
                params, cfg, rope, ids, cache2, meta, xlora_scalings=dummy
            )
            scal = classifier_forward(clf, xcfg, h1, L, n)
            h, cache = decoder_forward(
                params, cfg, rope, ids, cache, meta, xlora_scalings=scal
            )
            logits = compute_logits(params, cfg, h)  # [B, W, V] f32
            top = jnp.argmax(logits, axis=-1)
            chosen = jnp.take_along_axis(logits, top[..., None], axis=-1)[..., 0]
            return logits, jnp.stack([top.astype(jnp.float32), chosen]), cache, cache2

        return verify

    def _verify(self, ids, positions, slot_mapping, block_tables, kv_lens,
                active):
        if self._verify_fn is None:
            self._verify_fn = self._build_verify_fn()
        logits, pack, self.cache, self.cache2 = self._verify_fn(
            self.params, self.clf, self.cache, self.cache2,
            jnp.asarray(ids), jnp.asarray(positions), jnp.asarray(slot_mapping),
            jnp.asarray(block_tables), jnp.asarray(kv_lens), jnp.asarray(active),
        )
        return logits, pack
