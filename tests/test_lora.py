"""LoRA / X-LoRA tests: adapter math vs manual reference, engine
integration, runtime activation, merging, PEFT roundtrip, X-LoRA dual-pass
consistency."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch
import transformers as tf

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.lora import (
    LoraAdapter,
    activate_adapters,
    apply_lora_to_params,
    load_peft_adapter,
    make_lora,
    merge_lora,
)
from mistralrs_tpu.lora.peft import save_peft_adapter
from mistralrs_tpu.lora.xlora import (
    XLoraConfig,
    XLoraPipeline,
    classifier_forward,
    make_classifier,
)
from mistralrs_tpu.models.config import config_from_hf
from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline
from mistralrs_tpu.quant.qlinear import linear, make_dense


# ---------------------------------------------------------------- unit math
def test_lora_forward_matches_manual():
    rng = np.random.default_rng(0)
    IN, OUT, R, N = 16, 24, 4, 3
    w = rng.standard_normal((IN, OUT)).astype(np.float32)
    a = rng.standard_normal((N, IN, R)).astype(np.float32)
    b = rng.standard_normal((N, R, OUT)).astype(np.float32)
    scale = np.asarray([2.0, 0.5, 1.0], np.float32)
    gates = np.asarray([1.0, 0.0, 1.0], np.float32)
    lin = make_lora(make_dense(jnp.asarray(w)), jnp.asarray(a), jnp.asarray(b), scale, gates)
    x = rng.standard_normal((5, IN)).astype(np.float32)
    got = np.asarray(linear(lin, jnp.asarray(x)))
    want = x @ w
    for i in range(N):
        want = want + gates[i] * scale[i] * (x @ a[i] @ b[i])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_lora_forward_with_per_token_scalings():
    rng = np.random.default_rng(1)
    IN, OUT, R, N, T = 8, 8, 2, 2, 4
    w = rng.standard_normal((IN, OUT)).astype(np.float32)
    a = rng.standard_normal((N, IN, R)).astype(np.float32)
    b = rng.standard_normal((N, R, OUT)).astype(np.float32)
    lin = make_lora(make_dense(jnp.asarray(w)), jnp.asarray(a), jnp.asarray(b),
                    np.ones(N, np.float32))
    x = rng.standard_normal((T, IN)).astype(np.float32)
    sc = rng.uniform(0, 1, size=(T, N)).astype(np.float32)
    got = np.asarray(linear(lin, jnp.asarray(x), jnp.asarray(sc)))
    want = x @ w
    for t in range(T):
        for i in range(N):
            want[t] += sc[t, i] * (x[t] @ a[i] @ b[i])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------- helpers
def _tiny_model(seed=3):
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
    return cfg, params


def _adapter(name, cfg, rng, r=4, alpha=8.0, layers=None, targets=("q_proj", "v_proj")):
    weights = {}
    D = cfg.hidden_size
    for i in layers if layers is not None else range(cfg.num_layers):
        for t in targets:
            out_f = cfg.num_kv_heads * cfg.head_dim if t in ("k_proj", "v_proj") else D
            A = (rng.standard_normal((r, D)) * 0.1).astype(np.float32)
            B = (rng.standard_normal((out_f, r)) * 0.1).astype(np.float32)
            weights[f"{i}.{t}"] = (A, B)
    return LoraAdapter(name=name, r=r, alpha=alpha, weights=weights)


def _engine(cfg, params, pipeline_cls=TextPipeline, **pkw):
    pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                        prefill_buckets=(8, 16), dtype=jnp.float32)
    pipe = pipeline_cls(cfg, params, make_rope(cfg), pc, **pkw)
    return Engine(pipe, eos_token_ids=set())


# ---------------------------------------------------------------- engine e2e
def test_zero_adapter_is_identity():
    cfg, params = _tiny_model()
    rng = np.random.default_rng(2)
    ad = _adapter("zero", cfg, rng)
    ad.weights = {k: (A, np.zeros_like(B)) for k, (A, B) in ad.weights.items()}
    lparams = apply_lora_to_params(params, cfg, [ad])
    prompt = rng.integers(3, 120, size=9).tolist()
    base, _ = _engine(cfg, params).generate(prompt, SamplingParams(max_len=8))
    wrapped, _ = _engine(cfg, lparams).generate(prompt, SamplingParams(max_len=8))
    assert wrapped == base


def test_adapter_changes_output_and_deactivation_restores():
    cfg, params = _tiny_model()
    rng = np.random.default_rng(3)
    ad = _adapter("style", cfg, rng)
    lparams = apply_lora_to_params(params, cfg, [ad])
    prompt = rng.integers(3, 120, size=9).tolist()
    base, _ = _engine(cfg, params).generate(prompt, SamplingParams(max_len=8))
    on, _ = _engine(cfg, lparams).generate(prompt, SamplingParams(max_len=8))
    assert on != base  # adapter has an effect
    off_params = activate_adapters(lparams, ["style"], [])
    off, _ = _engine(cfg, off_params).generate(prompt, SamplingParams(max_len=8))
    assert off == base  # gates=0 restores the base model exactly


def test_merge_matches_unmerged():
    cfg, params = _tiny_model()
    rng = np.random.default_rng(4)
    ads = [_adapter("a1", cfg, rng), _adapter("a2", cfg, rng, r=2, alpha=2.0)]
    lparams = apply_lora_to_params(params, cfg, ads)
    merged = merge_lora(lparams)
    prompt = rng.integers(3, 120, size=7).tolist()
    um, _ = _engine(cfg, lparams).generate(prompt, SamplingParams(max_len=8))
    mg, _ = _engine(cfg, merged).generate(prompt, SamplingParams(max_len=8))
    assert um == mg
    # merged tree has no lora wrappers left on dense bases
    from mistralrs_tpu.quant.qlinear import Linear

    kinds = [
        l.kind
        for l in jax.tree.leaves(merged, is_leaf=lambda x: isinstance(x, Linear))
        if isinstance(l, Linear)
    ]
    assert "lora" not in kinds


def test_partial_layer_adapter():
    """Adapter targeting only layer 0 still works (zero-padded elsewhere)."""
    cfg, params = _tiny_model()
    rng = np.random.default_rng(5)
    ad = _adapter("l0", cfg, rng, layers=[0])
    lparams = apply_lora_to_params(params, cfg, [ad])
    prompt = rng.integers(3, 120, size=7).tolist()
    base, _ = _engine(cfg, params).generate(prompt, SamplingParams(max_len=6))
    on, _ = _engine(cfg, lparams).generate(prompt, SamplingParams(max_len=6))
    assert on != base


def test_peft_roundtrip(tmp_path):
    cfg, _ = _tiny_model()
    rng = np.random.default_rng(6)
    ad = _adapter("rt", cfg, rng, r=3, alpha=6.0)
    save_peft_adapter(str(tmp_path / "rt"), ad)
    back = load_peft_adapter(str(tmp_path / "rt"))
    assert back.name == "rt" and back.r == 3 and back.alpha == 6.0
    assert set(back.weights) == set(ad.weights)
    for k in ad.weights:
        np.testing.assert_array_equal(back.weights[k][0], ad.weights[k][0])
        np.testing.assert_array_equal(back.weights[k][1], ad.weights[k][1])


# ---------------------------------------------------------------- X-LoRA
def _xlora_setup(seed=7, **xkw):
    cfg, params = _tiny_model()
    rng = np.random.default_rng(seed)
    ads = [_adapter("x1", cfg, rng), _adapter("x2", cfg, rng)]
    lparams = apply_lora_to_params(params, cfg, ads)
    xcfg = XLoraConfig(hidden_size=16, xlora_depth=2, **xkw)
    clf = make_classifier(rng, cfg.hidden_size, cfg.num_layers, len(ads), xcfg)
    return cfg, params, lparams, clf, xcfg, rng


def test_xlora_zero_weight_is_base_model():
    cfg, params, lparams, clf, xcfg, rng = _xlora_setup(
        global_scaling_weight=0.0, scaling_pass_value=0.0
    )
    prompt = rng.integers(3, 120, size=9).tolist()
    base, _ = _engine(cfg, params).generate(prompt, SamplingParams(max_len=6))
    x, _ = _engine(cfg, lparams, XLoraPipeline, classifier=clf, xcfg=xcfg,
                   n_adapters=2).generate(prompt, SamplingParams(max_len=6))
    assert x == base


def test_xlora_classifier_shapes_and_softmax():
    cfg, params, lparams, clf, xcfg, rng = _xlora_setup()
    h = jnp.asarray(rng.standard_normal((2, 5, cfg.hidden_size)), jnp.float32)
    scal = classifier_forward(clf, xcfg, h, cfg.num_layers, 2)
    assert scal.shape == (2, 5, cfg.num_layers, 2)
    np.testing.assert_allclose(np.asarray(scal.sum(-1)), 1.0, rtol=1e-5)


def test_xlora_engine_prefill_decode_consistency():
    """Chunked prefill + decode must equal one-shot prefill (cache2 parity)."""
    cfg, params, lparams, clf, xcfg, rng = _xlora_setup()
    prompt_long = rng.integers(3, 120, size=21).tolist()  # 2 chunks
    prompt_short = prompt_long[:5]
    eng = _engine(cfg, lparams, XLoraPipeline, classifier=clf, xcfg=xcfg, n_adapters=2)
    toks_long, _ = eng.generate(prompt_long, SamplingParams(max_len=6))
    eng2 = _engine(cfg, lparams, XLoraPipeline, classifier=clf, xcfg=xcfg, n_adapters=2)
    toks2, _ = eng2.generate(prompt_short + prompt_long[5:], SamplingParams(max_len=6))
    assert toks_long == toks2
    # and the adapters actually influence generation
    base, _ = _engine(cfg, params).generate(prompt_long, SamplingParams(max_len=6))
    assert toks_long != base


def test_xlora_nonlayerwise_broadcast():
    cfg, params, lparams, clf0, _, rng = _xlora_setup()
    xcfg = XLoraConfig(hidden_size=16, xlora_depth=2, layerwise_scalings=False)
    clf = make_classifier(rng, cfg.hidden_size, cfg.num_layers, 2, xcfg)
    h = jnp.asarray(rng.standard_normal((1, 3, cfg.hidden_size)), jnp.float32)
    scal = classifier_forward(clf, xcfg, h, cfg.num_layers, 2)
    assert scal.shape == (1, 3, cfg.num_layers, 2)
    np.testing.assert_allclose(np.asarray(scal[:, :, 0]), np.asarray(scal[:, :, 1]))


def test_xlora_non_granular_scalings():
    """After tgt_non_granular_index generated tokens, decode switches to the
    frozen-scalings single pass; generation still progresses and the early
    tokens (granular phase) match the always-granular engine."""
    cfg, params, lparams, clf, _, rng = _xlora_setup()
    xcfg_g = XLoraConfig(hidden_size=16, xlora_depth=2)
    xcfg_ng = XLoraConfig(hidden_size=16, xlora_depth=2, tgt_non_granular_index=3)
    prompt = rng.integers(3, 120, size=9).tolist()
    full, _ = _engine(cfg, lparams, XLoraPipeline, classifier=clf, xcfg=xcfg_g,
                      n_adapters=2).generate(prompt, SamplingParams(max_len=8))
    ng, _ = _engine(cfg, lparams, XLoraPipeline, classifier=clf, xcfg=xcfg_ng,
                    n_adapters=2).generate(prompt, SamplingParams(max_len=8))
    assert ng[:3] == full[:3]  # granular phase identical
    assert len(ng) == 8
