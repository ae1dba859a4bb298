"""Prefix cache tests: trie semantics on the block manager, engine
integration (skipped prefill on hit, identical outputs), eviction under
pressure. Mirrors what reference prefix_cacher.rs guarantees."""

import dataclasses

import numpy as np

from mistralrs_tpu.engine.block_manager import BlockManager
from mistralrs_tpu.engine.engine import Engine, GenerationRequest
from mistralrs_tpu.engine.prefix_cache import PrefixCacheManager
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.engine.sequence import Sequence


def _seq(tokens, bm=None):
    s = Sequence(list(tokens), SamplingParams())
    return s


def test_match_returns_page_aligned_proper_prefix():
    bm = BlockManager(num_pages=32, page_size=4)
    pc = PrefixCacheManager(bm)
    s = _seq(range(10))
    bm.allocate(s)
    s.kv_len = 10
    pc.insert(s.tokens, s.block_table, s.kv_len)  # caches 2 full pages (8 toks)
    assert pc.num_cached_pages == 2

    # identical prompt: must leave >=1 token to prefill -> 8 matched
    n, pages = pc.match(list(range(10)))
    assert n == 8 and len(pages) == 2
    # exactly the cached prefix as prompt: proper prefix rule caps at 4
    n, pages = pc.match(list(range(8)))
    assert n == 4 and len(pages) == 1
    # diverging second page: only first page matches
    n, pages = pc.match([0, 1, 2, 3, 9, 9, 9, 9, 5])
    assert n == 4 and len(pages) == 1
    # diverging first token: no match
    n, pages = pc.match([7] * 12)
    assert n == 0 and pages == []


def test_insert_dedups_shared_prefix():
    bm = BlockManager(num_pages=32, page_size=4)
    pc = PrefixCacheManager(bm)
    a = _seq(list(range(8)) + [100, 101, 102, 103])
    bm.allocate(a)
    a.kv_len = 12
    pc.insert(a.tokens, a.block_table, a.kv_len)
    b = _seq(list(range(8)) + [200, 201, 202, 203])
    bm.allocate(b)
    b.kv_len = 12
    pc.insert(b.tokens, b.block_table, b.kv_len)
    # first two pages dedup; only the divergent third pages are distinct
    assert pc.num_cached_pages == 4


def test_evict_lru_frees_pages():
    bm = BlockManager(num_pages=16, page_size=4)
    pc = PrefixCacheManager(bm, max_pages=100)
    seqs = []
    for i in range(3):
        s = _seq([i * 50 + j for j in range(8)])
        bm.allocate(s)
        s.kv_len = 8
        seqs.append(s)
        pc.insert(s.tokens, s.block_table, s.kv_len)
        bm.free_sequence(s)
    assert pc.num_cached_pages == 6
    free_before = bm.num_free
    # touch seq 0's prefix so it is MRU
    pc.match(seqs[0].tokens + [1])
    freed = pc.evict(2)
    assert freed == 2
    assert bm.num_free == free_before + 2
    # seq 0's entry survived (MRU), so matching it still hits
    n, _ = pc.match([0, 1, 2, 3, 4, 5, 6, 7, 99])
    assert n == 8


def test_evict_skips_pages_shared_with_live_seq():
    bm = BlockManager(num_pages=16, page_size=4)
    pc = PrefixCacheManager(bm, max_pages=100)
    s = _seq(range(8))
    bm.allocate(s)
    s.kv_len = 8
    pc.insert(s.tokens, s.block_table, s.kv_len)
    # a live sequence shares the cached pages
    live = _seq(range(8))
    bm.share_prefix(live, s.block_table)
    bm.free_sequence(s)
    free_before = bm.num_free
    pc.evict(4)  # drains the trie but live refs keep pages resident
    assert pc.num_cached_pages == 0
    assert bm.num_free == free_before
    bm.free_sequence(live)
    assert bm.num_free == free_before + 2


def test_max_pages_cap_enforced_on_insert():
    bm = BlockManager(num_pages=64, page_size=4)
    pc = PrefixCacheManager(bm, max_pages=3)
    for i in range(4):
        s = _seq([i * 40 + j for j in range(8)])
        bm.allocate(s)
        s.kv_len = 8
        pc.insert(s.tokens, s.block_table, s.kv_len)
        bm.free_sequence(s)
    assert pc.num_cached_pages <= 3


def _tiny_real_engine(prefix_cache=True, seed=3):
    import json

    import jax.numpy as jnp
    import torch
    import transformers as tf

    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    torch.manual_seed(seed)
    hf_cfg = tf.LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=128,
    )
    model = tf.LlamaForCausalLM(hf_cfg).eval().float()
    cfg = config_from_hf(json.loads(hf_cfg.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    pipe = TextPipeline(
        cfg, params, make_rope(cfg),
        PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                       prefill_buckets=(8, 16), dtype=jnp.float32),
    )
    return Engine(pipe, eos_token_ids=set(), prefix_cache=prefix_cache)


def test_prefix_hit_skips_prefill_and_matches_cold_output():
    eng = _tiny_real_engine(prefix_cache=True)
    rng = np.random.default_rng(11)
    prompt = rng.integers(3, 120, size=13).tolist()
    cold, _ = eng.generate(prompt, SamplingParams(max_len=6))
    assert eng.prefix_cacher.num_cached_pages > 0
    # same prompt again: hits the cache, output must be identical
    warm, _ = eng.generate(prompt, SamplingParams(max_len=6))
    assert warm == cold
    assert eng.prefix_cacher.hits >= 1
    # and an extended prompt (prompt + first cold token) also reuses pages
    ext, _ = eng.generate(prompt + cold[:1], SamplingParams(max_len=5))
    assert ext == cold[1:6]


def test_prefix_cache_off_matches_on():
    rng = np.random.default_rng(21)
    prompt = rng.integers(3, 120, size=17).tolist()
    on = _tiny_real_engine(prefix_cache=True)
    off = _tiny_real_engine(prefix_cache=False)
    for eng in (on, off):
        eng.generate(prompt, SamplingParams(max_len=4))
    a, _ = on.generate(prompt, SamplingParams(max_len=8))
    b, _ = off.generate(prompt, SamplingParams(max_len=8))
    assert a == b


def test_cached_pages_survive_concurrent_decode():
    """A warm request sharing cached pages runs concurrently with a fresh one;
    the shared pages must not be clobbered (COW/fresh-page discipline)."""
    eng = _tiny_real_engine(prefix_cache=True)
    rng = np.random.default_rng(31)
    p1 = rng.integers(3, 120, size=9).tolist()
    p2 = rng.integers(3, 120, size=9).tolist()
    cold1, _ = eng.generate(p1, SamplingParams(max_len=6))
    g1 = eng.add_request(GenerationRequest(p1, SamplingParams(max_len=6)))
    g2 = eng.add_request(GenerationRequest(p2, SamplingParams(max_len=6)))
    while eng.has_work:
        eng.step()
    assert g1.seqs[0].generated_tokens == cold1
    # p2 cold output must equal a from-scratch engine's answer
    ref = _tiny_real_engine(prefix_cache=False)
    want2, _ = ref.generate(p2, SamplingParams(max_len=6))
    assert g2.seqs[0].generated_tokens == want2
