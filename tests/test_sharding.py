"""SPMD sharding tests on the virtual 8-device CPU mesh."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch
import transformers as tf

from mistralrs_tpu.engine.engine import Engine, GenerationRequest
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.config import config_from_hf
from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
from mistralrs_tpu.parallel.mesh import make_mesh, param_specs, shard_params
from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline


def _tiny_llama(kv_heads=8):
    torch.manual_seed(21)
    hf = tf.LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=kv_heads, vocab_size=128,
        max_position_embeddings=128,
    )
    model = tf.LlamaForCausalLM(hf).eval().float()
    cfg = config_from_hf(json.loads(hf.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    return model, cfg, params


def _pipe(cfg, params, mesh=None):
    return TextPipeline(
        cfg, params, make_rope(cfg),
        PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                       prefill_buckets=(8, 16), dtype=jnp.float32),
        mesh=mesh,
    )


def test_mesh_shapes():
    mesh = make_mesh(dp=2)
    assert mesh.shape == {"dp": 2, "sp": 1, "tp": 4}
    mesh = make_mesh(dp=2, sp=2)
    assert mesh.shape == {"dp": 2, "sp": 2, "tp": 2}


def test_param_specs_structure_matches():
    _, cfg, params = _tiny_llama()
    specs = param_specs(params, cfg)
    # identical treedef => tree.map works
    jax.tree.map(lambda x, s: None, params, specs)


def test_sharded_decode_matches_unsharded():
    model, cfg, params = _tiny_llama()
    mesh = make_mesh(dp=2, tp=4)
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, 120, size=9).tolist()

    eng_ref = Engine(_pipe(cfg, params), eos_token_ids=set())
    want, _ = eng_ref.generate(prompt, SamplingParams(max_len=6))

    eng_sh = Engine(_pipe(cfg, params, mesh), eos_token_ids=set())
    got, _ = eng_sh.generate(prompt, SamplingParams(max_len=6))
    assert got == want

    with torch.no_grad():
        hf = model.generate(torch.tensor([prompt]), max_new_tokens=6, do_sample=False)[0, 9:].tolist()
    assert got == hf


def test_sharded_mixtral_expert_parallel():
    torch.manual_seed(22)
    hf = tf.MixtralConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=8, vocab_size=128,
        num_local_experts=4, num_experts_per_tok=2, max_position_embeddings=128,
    )
    model = tf.MixtralForCausalLM(hf).eval().float()
    cfg = config_from_hf(json.loads(hf.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    mesh = make_mesh(dp=2, tp=4)
    rng = np.random.default_rng(6)
    prompt = rng.integers(3, 120, size=7).tolist()
    eng = Engine(_pipe(cfg, params, mesh), eos_token_ids=set())
    got, _ = eng.generate(prompt, SamplingParams(max_len=5))
    with torch.no_grad():
        want = model.generate(torch.tensor([prompt]), max_new_tokens=5, do_sample=False)[0, 7:].tolist()
    assert got == want


def test_sequence_parallel_prefill_matches():
    """Engine generation under a dp×sp×tp mesh: the first prefill chunk runs
    ring attention sequence-sharded over sp (decoder _use_ring_prefill);
    greedy tokens must match the unsharded engine and HF."""
    model, cfg, params = _tiny_llama()
    mesh = make_mesh(dp=2, sp=2, tp=2)
    rng = np.random.default_rng(7)
    prompt = rng.integers(3, 120, size=11).tolist()

    eng_ref = Engine(_pipe(cfg, params), eos_token_ids=set())
    want, _ = eng_ref.generate(prompt, SamplingParams(max_len=6))

    eng_sp = Engine(_pipe(cfg, params, mesh), eos_token_ids=set())
    got, _ = eng_sp.generate(prompt, SamplingParams(max_len=6))
    assert got == want

    with torch.no_grad():
        hf = model.generate(torch.tensor([prompt]), max_new_tokens=6,
                            do_sample=False)[0, 11:].tolist()
    assert got == hf


def test_ring_attention_matches_dense():
    """Blockwise ring attention over the 8-device mesh == dense SDPA."""
    import jax
    import jax.numpy as jnp

    from mistralrs_tpu.ops.attention import causal_mask_bias, sdpa
    from mistralrs_tpu.parallel.mesh import make_mesh
    from mistralrs_tpu.parallel.ring_attention import ring_attention

    mesh = make_mesh(jax.devices()[:8], dp=1)
    rng = np.random.default_rng(0)
    B, T, Hq, Hkv, D = 2, 64, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)

    got = np.asarray(ring_attention(q, k, v, mesh, causal=True))
    bias = causal_mask_bias(T, T)
    want = np.asarray(sdpa(q, k, v, scale=D**-0.5, mask=bias))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # non-causal too
    got = np.asarray(ring_attention(q, k, v, mesh, causal=False))
    want = np.asarray(sdpa(q, k, v, scale=D**-0.5, mask=None))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pipeline_parallel_matches_dense():
    """Stage-sharded pp_decoder_forward (shard_map + ppermute microbatch
    pipeline) == single-device decoder_forward: prefill then a decode step,
    hidden states and KV pools identical."""
    from mistralrs_tpu.models.decoder import decoder_forward
    from mistralrs_tpu.ops.paged_attention import PagedAttnMeta, PagedKVCache
    from mistralrs_tpu.parallel.pipeline_parallel import make_pp_mesh, pp_decoder_forward

    torch.manual_seed(33)
    hf = tf.LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=96,
        max_position_embeddings=64,
    )
    model = tf.LlamaForCausalLM(hf).eval().float()
    cfg = config_from_hf(json.loads(hf.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    rope = make_rope(cfg, 64)
    mesh = make_pp_mesh(jax.devices()[:4])

    B, T, page = 4, 8, 4
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(3, 90, size=(B, T)), jnp.int32)
    # page 0 reserved; each row gets 3 distinct pages (room for T + decode)
    tables = np.arange(1, 1 + B * 3, dtype=np.int32).reshape(B, 3)
    positions = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    slots = tables[:, positions[0] // page] * page + positions % page

    def fresh():
        return PagedKVCache.create(cfg.num_layers, 16, page, cfg.num_kv_heads,
                                   cfg.head_dim, jnp.float32)

    meta = PagedAttnMeta(
        positions=jnp.asarray(positions), slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(tables), kv_lens=jnp.full((B,), T, jnp.int32),
        active=jnp.ones((B,), jnp.float32),
    )
    want_h, want_cache = decoder_forward(params, cfg, rope, ids, fresh(), meta)
    got_h, got_cache = pp_decoder_forward(params, cfg, rope, ids, fresh(), meta, mesh)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=2e-5, atol=2e-5)
    # page 0 is the reserved scratch page (idle pipeline ticks park their
    # garbage writes there) — live pages must match exactly
    np.testing.assert_allclose(np.asarray(got_cache.k)[:, 1:],
                               np.asarray(want_cache.k)[:, 1:],
                               rtol=2e-5, atol=2e-5)

    # one decode step on top of the prefilled caches
    ids_d = jnp.asarray(rng.integers(3, 90, size=(B, 1)), jnp.int32)
    pos_d = np.full((B, 1), T, np.int32)
    slots_d = tables[:, [T // page]] * page + T % page
    meta_d = PagedAttnMeta(
        positions=jnp.asarray(pos_d), slot_mapping=jnp.asarray(slots_d),
        block_tables=jnp.asarray(tables),
        kv_lens=jnp.full((B,), T + 1, jnp.int32),
        active=jnp.ones((B,), jnp.float32),
    )
    want_h, _ = decoder_forward(params, cfg, rope, ids_d, want_cache, meta_d)
    got_h, _ = pp_decoder_forward(params, cfg, rope, ids_d, got_cache, meta_d,
                                  mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=2e-5, atol=2e-5)


def test_pp_serving_pipeline_matches_dense_engine():
    """PPTextPipeline: the engine serving over a ("pp",) stage mesh produces
    the same greedy tokens as the single-device engine (chunked prefill +
    decode, batched prefill surface included)."""
    from mistralrs_tpu.parallel.pipeline_parallel import PPTextPipeline, make_pp_mesh

    torch.manual_seed(91)
    hf = tf.LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=96,
        max_position_embeddings=128,
    )
    model = tf.LlamaForCausalLM(hf).eval().float()
    cfg = config_from_hf(json.loads(hf.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    rope = make_rope(cfg)
    pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                        prefill_buckets=(8, 16), dtype=jnp.float32,
                        fuse_projections=False)
    rng = np.random.default_rng(5)
    p1 = rng.integers(3, 90, size=11).tolist()
    p2 = rng.integers(3, 90, size=6).tolist()

    ref = Engine(TextPipeline(cfg, params, rope, pc), eos_token_ids=set())
    w1, _ = ref.generate(list(p1), SamplingParams(max_len=6))
    w2, _ = ref.generate(list(p2), SamplingParams(max_len=5))

    mesh = make_pp_mesh(jax.devices()[:4])
    eng = Engine(PPTextPipeline(cfg, params, rope, pc, mesh),
                 eos_token_ids=set())
    g1 = eng.add_request(GenerationRequest(list(p1), SamplingParams(max_len=6)))
    g2 = eng.add_request(GenerationRequest(list(p2), SamplingParams(max_len=5)))
    while eng.has_work:
        eng.step()
    assert g1.seqs[0].generated_tokens == w1
    assert g2.seqs[0].generated_tokens == w2
    with torch.no_grad():
        hf1 = model.generate(torch.tensor([p1]), max_new_tokens=6,
                             do_sample=False)[0, len(p1):].tolist()
    assert g1.seqs[0].generated_tokens == hf1


@pytest.mark.parametrize("isq", ["Q2K", "Q3K", "Q5K", "Q4K", "Q8_0", "HQQ2", "HQQ8"])
def test_sharded_quantized_decode_matches_unsharded(isq):
    """TP/DP sharding of the packed quant layouts (qs/qh/q/scale/minv rows,
    q6k perm tables): sharded greedy decode must equal unsharded for every
    packed device format."""
    torch.manual_seed(23)
    hf = tf.LlamaConfig(
        hidden_size=256, intermediate_size=512, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=8, vocab_size=128,
        max_position_embeddings=128,
    )
    tf.LlamaForCausalLM(hf).eval().float()
    cfg = config_from_hf(json.loads(hf.to_json_string()))
    model = tf.LlamaForCausalLM(hf).eval().float()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd),
                                dtype=jnp.float32, isq=isq)
    from mistralrs_tpu.quant.qlinear import Linear

    kinds = {l.kind for l in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, Linear)) if isinstance(l, Linear)}
    assert kinds - {"dense"}, f"ISQ {isq} produced no packed linears"
    rng = np.random.default_rng(7)
    prompt = rng.integers(3, 120, size=9).tolist()
    want, _ = Engine(_pipe(cfg, params), eos_token_ids=set()).generate(
        prompt, SamplingParams(max_len=6))
    mesh = make_mesh(dp=2, tp=4)
    got, _ = Engine(_pipe(cfg, params, mesh), eos_token_ids=set()).generate(
        prompt, SamplingParams(max_len=6))
    assert got == want


def test_sharded_lora_decode_matches_unsharded():
    """TP sharding of LoRA-wrapped linears (adapter banks follow the base
    layout: B shards out under column-parallel, A shards in under
    row-parallel) — crashed with a missing spec before."""
    import sys

    sys.path.insert(0, "tests")
    from test_lora import _adapter, _tiny_model

    cfg, params = _tiny_model()
    from mistralrs_tpu.lora import apply_lora_to_params

    rng = np.random.default_rng(9)
    ad = _adapter("s1", cfg, rng, r=4, alpha=8.0,
                  targets=("q_proj", "v_proj", "o_proj"))
    lparams = apply_lora_to_params(params, cfg, [ad])
    prompt = rng.integers(3, 120, size=9).tolist()
    want, _ = Engine(_pipe(cfg, lparams), eos_token_ids=set()).generate(
        prompt, SamplingParams(max_len=6))
    mesh = make_mesh(dp=4, tp=2)  # tiny model has 2 kv heads (tp | kv_heads)
    got, _ = Engine(_pipe(cfg, lparams, mesh), eos_token_ids=set()).generate(
        prompt, SamplingParams(max_len=6))
    assert got == want


def test_gptq_ragged_act_order_has_specs():
    """A desc_act GPTQ checkpoint with RAGGED group sizes keeps g_idx in
    Linear.data (quant/gptq.py ragged fallback); param_specs' spec dict must
    cover it (crashed with KeyError 'g_idx' before)."""
    from mistralrs_tpu.parallel.mesh import _lin_spec
    from mistralrs_tpu.quant.gptq import gptq_linear_from_tensors

    rng = np.random.default_rng(3)
    in_f, out_f, bits = 64, 32, 4
    # ragged groups: 48 rows in group 0, 16 in group 1
    g_idx = np.array([0] * 48 + [1] * 16, np.int32)
    qweight = rng.integers(0, 2**31 - 1, (in_f * bits // 32, out_f),
                           dtype=np.int32)
    qzeros = rng.integers(0, 2**31 - 1, (2, out_f * bits // 32), dtype=np.int32)
    scales = (rng.standard_normal((2, out_f)) * 0.01).astype(np.float32)
    lin = gptq_linear_from_tensors(qweight, qzeros, scales, g_idx, bits,
                                   in_f, out_f)
    assert "g_idx" in lin.data  # the ragged fallback this test is about
    for col in (True, False):
        spec = _lin_spec(lin.kind, col, stacked=True)
        missing = [k for k in lin.data if k not in spec]
        assert not missing, missing


def test_sharded_kv_quant_decode_matches_unsharded():
    """int8 KV pools under dp x tp: scale pools shard on the head axis
    alongside the payloads (shard_cache quantized branch)."""
    _, cfg, params = _tiny_llama(kv_heads=2)
    rng = np.random.default_rng(11)
    prompt = rng.integers(3, 120, size=9).tolist()

    def pipe(mesh):
        pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2,
                            max_model_len=128, prefill_buckets=(8, 16),
                            dtype=jnp.float32, kv_quant=True)
        return TextPipeline(cfg, params, make_rope(cfg), pc, mesh=mesh)

    want, _ = Engine(pipe(None), eos_token_ids=set()).generate(
        prompt, SamplingParams(max_len=6))
    got, _ = Engine(pipe(make_mesh(dp=4, tp=2)), eos_token_ids=set()).generate(
        prompt, SamplingParams(max_len=6))
    assert got == want


def test_sharded_ragged_backend_matches_unsharded(monkeypatch):
    """MISTRALRS_ATTN_BACKEND=ragged under dp x tp: the combined pool's
    interleaved head axis (2*Hkv) shards over tp like the separate pools."""
    _, cfg, params = _tiny_llama(kv_heads=2)
    rng = np.random.default_rng(12)
    prompt = rng.integers(3, 120, size=9).tolist()
    monkeypatch.setenv("MISTRALRS_ATTN_BACKEND", "ragged")

    def run(mesh):
        pipe = _pipe(cfg, params, mesh)
        assert pipe.kv_combined
        return Engine(pipe, eos_token_ids=set()).generate(
            prompt, SamplingParams(max_len=6))[0]

    assert run(make_mesh(dp=4, tp=2)) == run(None)
