"""Vision pipeline: image features spliced into prefill embeddings.

Reference parity: mistralrs-core/src/pipeline/vision.rs (`VisionPipeline`)
+ vision model forwards (llava15.rs prepare_inputs_labels_for_multimodal).
The decode path is identical to TextPipeline (images only affect prefill);
prefill runs a separate jitted step whose inputs are (ids, features,
feature_idx): embeddings are `where(ids == image_token, features[idx],
embed[ids])`, so chunked prefill can split an image's token span freely —
each chunk gathers its own slice of the precomputed features.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mistralrs_tpu.engine.sequence import Sequence
from mistralrs_tpu.models.decoder import compute_logits, decoder_forward
from mistralrs_tpu.ops.paged_attention import PagedAttnMeta
from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline, _next_bucket


class VisionPipeline(TextPipeline):
    """TextPipeline + vision tower. `vision_encode(seq)` is model-specific
    (llava / llava-next / idefics2 subclasses or a callback)."""
    supports_batched_prefill = False  # per-seq prefill state

    def __init__(self, cfg, params, rope, pc: PipelineConfig, *,
                 image_token_id: int, encode_images, mesh=None):
        """encode_images(seq) -> np/jnp [n_image_positions, E] — one row per
        image placeholder token, in order."""
        self.image_token_id = image_token_id
        self.encode_images = encode_images
        super().__init__(cfg, params, rope, pc, mesh=mesh)
        self._embed_step_fn = self._build_embed_step_fn()

    def _build_embed_step_fn(self):
        cfg, rope, img_id = self.cfg, self.rope, self.image_token_id
        hm = self.head_major

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, cache, ids, feats, feat_idx, positions, slot_mapping,
                 block_tables, kv_lens, active, last_idx):
            meta = PagedAttnMeta(
                positions=positions, slot_mapping=slot_mapping,
                block_tables=block_tables, kv_lens=kv_lens, active=active,
                head_major=hm,
            )
            h = jnp.take(params.embed, ids, axis=0)  # [B, T, E]
            if cfg.embed_scale != 1.0:
                h = h * jnp.asarray(cfg.embed_scale, h.dtype)
            img = jnp.take(feats, feat_idx, axis=0).astype(h.dtype)  # [B, T, E]
            h = jnp.where((ids == img_id)[..., None], img, h)
            B = ids.shape[0]
            hid, cache = decoder_forward(params, cfg, rope, ids, cache, meta,
                                         input_embeds=h)
            h_last = hid[jnp.arange(B), last_idx]
            logits = compute_logits(params, cfg, h_last)
            top = jnp.argmax(logits, axis=-1)
            chosen = jnp.take_along_axis(logits, top[:, None], axis=-1)[:, 0]
            pack = jnp.stack([top.astype(jnp.float32), chosen])
            return logits, pack, cache

        return step

    # ------------------------------------------------------------- features
    def _ensure_features(self, seq: Sequence) -> None:
        if getattr(seq, "image_features", None) is not None:
            return
        if not getattr(seq, "images", None):
            seq.image_features = None
            return
        feats = self.encode_images(seq)  # [n_positions, E]
        seq.image_features = jnp.asarray(feats)

    # ------------------------------------------------------------- prefill
    def run_prefill_chunk(self, seq: Sequence, chunk: list[int], greedy: bool = False,
                          advance_state: bool = True) -> np.ndarray:
        self._ensure_features(seq)
        feats = getattr(seq, "image_features", None)
        if feats is None:
            return super().run_prefill_chunk(seq, chunk, greedy=greedy,
                                             advance_state=advance_state)
        T = _next_bucket(len(chunk), self.pc.prefill_buckets)
        start = seq.prefill_done_tokens
        n = len(chunk)
        ids = np.zeros((1, T), np.int32)
        ids[0, :n] = chunk
        positions = np.zeros((1, T), np.int32)
        positions[0, :n] = np.arange(start, start + n)
        slot_mapping = np.zeros((1, T), np.int32)
        for j in range(n):
            slot_mapping[0, j] = self._slot(seq, start + j)
        block_tables = self._tables_row(seq)[None]
        kv_lens = np.asarray([start + T], np.int32)
        active = np.ones((1,), np.float32)
        last_idx = np.asarray([n - 1], np.int32)
        # feature index per position: running count of image tokens so far
        is_img = np.asarray(seq.tokens[: start + n]) == self.image_token_id
        cum = np.cumsum(is_img) - is_img  # index of each image token
        feat_idx = np.zeros((1, T), np.int32)
        feat_idx[0, :n] = cum[start : start + n]
        logits, pack, self.cache = self._embed_step_fn(
            self.params, self.cache,
            jnp.asarray(ids), feats, jnp.asarray(feat_idx),
            jnp.asarray(positions), jnp.asarray(slot_mapping),
            jnp.asarray(block_tables), jnp.asarray(kv_lens), jnp.asarray(active),
            jnp.asarray(last_idx),
        )
        self.last_greedy_pack = pack
        if advance_state:
            seq.prefill_done_tokens = start + n
            seq.kv_len = start + n
        if greedy:
            return np.asarray(pack)[:, 0]
        return np.asarray(logits)[0]
