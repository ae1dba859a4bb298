"""int8 KV cache (PipelineConfig.kv_quant): quantization math, page ops,
and end-to-end engine behavior. No reference equivalent (mistral.rs v0.2.5
has no KV quantization) — PAPERS.md KV-compression line; per-(slot, head)
absmax scales keep the error ~1/255 of each row's range."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mistralrs_tpu.ops.paged_attention import (
    PagedKVCache, copy_pages, gather_paged_kv_q, swap_in_pages,
    swap_out_pages, write_paged_kv_q,
)


@pytest.mark.parametrize("head_major", [False, True])
def test_quant_write_gather_roundtrip(head_major):
    rng = np.random.default_rng(3)
    L, P, page, H, D, B, T = 2, 8, 4, 2, 16, 2, 6
    cache = PagedKVCache.create(L, P, page, H, D, head_major=head_major,
                                quant=True)
    assert cache.quantized and cache.k.dtype == jnp.int8
    k = jnp.asarray(rng.standard_normal((B, T, H, D)) * 3.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.1, jnp.float32)
    tables = np.array([[1, 2], [3, 4]], np.int32)
    pos = np.tile(np.arange(T), (B, 1))
    slots = tables[np.arange(B)[:, None], pos // page] * page + pos % page
    ck, cv = (cache.k[0], cache.k_scale[0]), (cache.v[0], cache.v_scale[0])
    ck, cv = write_paged_kv_q(ck, cv, k, v, jnp.asarray(slots),
                              head_major=head_major)
    gk, gv = gather_paged_kv_q(ck, cv, jnp.asarray(tables),
                               head_major=head_major, dtype=jnp.float32)
    if head_major:  # [H, B, S, D] -> [B, S, H, D]
        gk = jnp.moveaxis(gk, 0, 2)
        gv = jnp.moveaxis(gv, 0, 2)
    # max error per element is scale/2 = row_absmax/254
    for got, want in ((gk, k), (gv, v)):
        w = np.asarray(want)
        tol = np.abs(w).max(axis=-1, keepdims=True) / 254 + 1e-6
        err = np.abs(np.asarray(got)[:, :T] - w)
        np.testing.assert_array_less(err, np.broadcast_to(tol * 1.01, err.shape))


def test_quant_page_ops_carry_scales():
    rng = np.random.default_rng(5)
    L, P, page, H, D = 1, 6, 2, 2, 8
    cache = PagedKVCache.create(L, P, page, H, D, quant=True)
    k = jnp.asarray(rng.standard_normal((1, 2, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, H, D)), jnp.float32)
    slots = jnp.asarray([[2, 3]])  # page 1
    ck, cv = write_paged_kv_q((cache.k[0], cache.k_scale[0]),
                              (cache.v[0], cache.v_scale[0]), k, v, slots)
    cache = PagedKVCache(k=ck[0][None], v=cv[0][None], k_scale=ck[1][None],
                         v_scale=cv[1][None])
    # COW copy page 1 -> 4: payload AND scales move
    c2 = copy_pages(cache, [1], [4])
    np.testing.assert_array_equal(np.asarray(c2.k[:, 4]), np.asarray(c2.k[:, 1]))
    np.testing.assert_array_equal(np.asarray(c2.k_scale[:, 4]),
                                  np.asarray(c2.k_scale[:, 1]))
    assert np.abs(np.asarray(c2.k_scale[:, 4])).max() > 0
    # swap out page 1, zero it, swap back in: bit-identical restore
    host = swap_out_pages(c2, [1])
    assert len(host) == 4  # k, v, k_scale, v_scale
    zeroed = PagedKVCache(
        k=c2.k.at[:, 1].set(0), v=c2.v.at[:, 1].set(0),
        k_scale=c2.k_scale.at[:, 1].set(0), v_scale=c2.v_scale.at[:, 1].set(0))
    c3 = swap_in_pages(zeroed, host, [1])
    np.testing.assert_array_equal(np.asarray(c3.k[:, 1]), np.asarray(c2.k[:, 1]))
    np.testing.assert_array_equal(np.asarray(c3.k_scale[:, 1]),
                                  np.asarray(c2.k_scale[:, 1]))


@pytest.mark.slow
@pytest.mark.parametrize("head_major", [False, True])
def test_engine_kv_quant_matches_bf16_greedy(head_major):
    """End-to-end: a tiny model served with kv_quant=True must greedy-decode
    the same tokens as the f32 cache (int8 per-row error is far below the
    tiny model's logit margins with this seed)."""
    import json

    import torch
    import transformers as tf

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import (
        TensorSource, make_rope, params_from_source,
    )
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    torch.manual_seed(3)
    hf_cfg = tf.LlamaConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=2, vocab_size=128,
                            max_position_embeddings=128)
    model = tf.LlamaForCausalLM(hf_cfg).eval().float()
    cfg = config_from_hf(json.loads(hf_cfg.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd),
                                dtype=jnp.float32)
    rope = make_rope(cfg)
    prompt = np.random.default_rng(1).integers(3, 120, size=9).tolist()

    def run(quant):
        pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2,
                            max_model_len=128, prefill_buckets=(16,),
                            dtype=jnp.float32, kv_quant=quant,
                            kv_head_major=head_major)
        eng = Engine(TextPipeline(cfg, params, rope, pc), eos_token_ids=set())
        toks, _ = eng.generate(prompt, SamplingParams(max_len=8))
        return toks

    assert run(True) == run(False)


def _tiny_engine(kv_quant, *, sliding_window=None, prefix_cache=False,
                 seed=3):
    import json

    import torch
    import transformers as tf

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import (
        TensorSource, make_rope, params_from_source,
    )
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    torch.manual_seed(seed)
    kw = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
              num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
              max_position_embeddings=128)
    if sliding_window:
        hf_cfg = tf.MistralConfig(**kw, sliding_window=sliding_window)
        model = tf.MistralForCausalLM(hf_cfg)
    else:
        hf_cfg = tf.LlamaConfig(**kw)
        model = tf.LlamaForCausalLM(hf_cfg)
    model = model.eval().float()
    cfg = config_from_hf(json.loads(hf_cfg.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd),
                                dtype=jnp.float32)
    pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2,
                        max_model_len=128, prefill_buckets=(16,),
                        dtype=jnp.float32, kv_quant=kv_quant)
    return Engine(TextPipeline(cfg, params, make_rope(cfg), pc),
                  eos_token_ids=set(), prefix_cache=prefix_cache)


@pytest.mark.slow
def test_kv_quant_with_prefix_cache():
    """Prefix-cache hits reuse int8 pages (page refs are payload-agnostic):
    a second request sharing the prompt prefix must decode identically."""
    from mistralrs_tpu.engine.sampler import SamplingParams

    prompt = np.random.default_rng(2).integers(3, 120, size=20).tolist()
    eng = _tiny_engine(True, prefix_cache=True)
    first, _ = eng.generate(prompt, SamplingParams(max_len=6))
    again, _ = eng.generate(prompt, SamplingParams(max_len=6))
    assert first == again
    cold = _tiny_engine(True, prefix_cache=False)
    base, _ = cold.generate(prompt, SamplingParams(max_len=6))
    assert first == base


@pytest.mark.slow
def test_kv_quant_sliding_window_matches_bf16():
    """Windowed models under kv_quant: the window-relative table slicing
    composes with the quantized gather (greedy parity vs f32 cache)."""
    from mistralrs_tpu.engine.sampler import SamplingParams

    prompt = np.random.default_rng(4).integers(3, 120, size=30).tolist()
    q, _ = _tiny_engine(True, sliding_window=12).generate(
        prompt, SamplingParams(max_len=10))
    f, _ = _tiny_engine(False, sliding_window=12).generate(
        prompt, SamplingParams(max_len=10))
    assert q == f
