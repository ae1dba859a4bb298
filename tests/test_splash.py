"""Splash-kernel prefill parity (interpret mode on CPU).

The splash path (models/decoder._use_splash_prefill, ops/splash.py) serves
first chunks the plain flash kernel rejects: gemma2's logit softcap with
per-layer window alternation, and window-clipped long first chunks on
mistral-family models. Both must match the masked dense path bit-for-shape.
On-chip kernel validation: tests/test_tpu_paths.py::test_splash_prefill_on_chip.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import transformers as tf

pytestmark = pytest.mark.slow  # interpret-mode model forwards (~1 min)

from mistralrs_tpu.models.config import config_from_hf
from mistralrs_tpu.models.decoder import decoder_forward
from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
from mistralrs_tpu.ops.paged_attention import PagedAttnMeta, PagedKVCache

TINY = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
    max_position_embeddings=256,
)


def _build(kind):
    torch.manual_seed(4)
    if kind == "gemma2":
        hf_cfg = tf.Gemma2Config(
            **{**TINY, "head_dim": 8}, sliding_window=48,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            query_pre_attn_scalar=8,
        )
        model = tf.Gemma2ForCausalLM(hf_cfg)
    else:
        hf_cfg = tf.MistralConfig(**TINY, sliding_window=40)
        model = tf.MistralForCausalLM(hf_cfg)
    model = model.eval().float()
    cfg = config_from_hf(json.loads(hf_cfg.to_json_string()))
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    return cfg, params, make_rope(cfg)


def _first_chunk_forward(cfg, params, rope, ids):
    B, T = ids.shape
    page = 16
    tables = np.arange(1, 1 + B * (T // page), dtype=np.int32).reshape(B, -1)
    positions = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    slots = tables[:, positions[0] // page] * page + positions % page
    meta = PagedAttnMeta(
        positions=jnp.asarray(positions), slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(tables), kv_lens=jnp.full((B,), T, jnp.int32),
        active=jnp.ones((B,), jnp.float32), first_chunk=True,
    )
    cache = PagedKVCache.create(cfg.num_layers, 1 + B * (T // page), page,
                                cfg.num_kv_heads, cfg.head_dim, jnp.float32)
    h, _ = jax.jit(
        lambda p, cc, i, m: decoder_forward(p, cfg, rope, i, cc, m)
    )(params, cache, jnp.asarray(ids), meta)
    return np.asarray(h)


@pytest.mark.parametrize("kind", ["gemma2", "mistral"])
def test_splash_prefill_matches_dense(kind, monkeypatch):
    """window < chunk (and softcap + alternation for gemma2): splash path
    must match the masked dense path on a 128-token first chunk."""
    cfg, params, rope = _build(kind)
    assert cfg.sliding_window < 128  # the clip case plain flash rejects
    ids = np.random.default_rng(2).integers(3, 120, size=(2, 128))
    monkeypatch.delenv("MISTRALRS_SPLASH", raising=False)
    dense = _first_chunk_forward(cfg, params, rope, ids)
    monkeypatch.setenv("MISTRALRS_SPLASH", "1")
    splash = _first_chunk_forward(cfg, params, rope, ids)
    np.testing.assert_allclose(splash, dense, rtol=2e-4, atol=2e-4)
