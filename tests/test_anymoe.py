"""AnyMoE tests: conversion, routing semantics, gate training with optax,
persistence, engine e2e (ref pipeline/amoe.rs + amoe/)."""

import pytest

pytestmark = pytest.mark.slow

import json

import jax.numpy as jnp
import numpy as np
import torch
import transformers as tf

from mistralrs_tpu.amoe import (
    AnyMoeConfig,
    convert_to_anymoe,
    load_gates,
    pretrain_gates,
)
from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.config import config_from_hf
from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline


def _tiny(seed):
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


def _engine(cfg, params):
    pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                        prefill_buckets=(8, 16), dtype=jnp.float32)
    return Engine(TextPipeline(cfg, params, make_rope(cfg), pc), eos_token_ids=set())


def test_convert_runs_and_identical_experts_match_base():
    """All experts = base model => MoE output == base output regardless of
    the (random) gate, since softmax weights sum to 1."""
    cfg, params = _tiny(3)
    moe_params = convert_to_anymoe(params, cfg, [params, params], AnyMoeConfig())
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 120, size=9).tolist()
    base, _ = _engine(cfg, params).generate(prompt, SamplingParams(max_len=6))
    moe, _ = _engine(cfg, moe_params).generate(prompt, SamplingParams(max_len=6))
    assert moe == base


def test_distinct_experts_change_output():
    cfg, params = _tiny(3)
    _, expert = _tiny(99)
    moe_params = convert_to_anymoe(params, cfg, [expert], AnyMoeConfig())
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 120, size=9).tolist()
    base, _ = _engine(cfg, params).generate(prompt, SamplingParams(max_len=6))
    moe, _ = _engine(cfg, moe_params).generate(prompt, SamplingParams(max_len=6))
    assert moe != base


def test_layer_subset_conversion():
    cfg, params = _tiny(3)
    _, expert = _tiny(98)
    moe_params = convert_to_anymoe(params, cfg, [expert], AnyMoeConfig(layers=[1]))
    import jax

    from mistralrs_tpu.lora.lora import unstack_groups

    layers = unstack_groups(moe_params)
    assert "anymoe" not in layers[0]["mlp"] and "anymoe" in layers[1]["mlp"]
    # still generates
    rng = np.random.default_rng(2)
    toks, _ = _engine(cfg, moe_params).generate(
        rng.integers(3, 120, size=5).tolist(), SamplingParams(max_len=4))
    assert len(toks) == 4


def test_gate_training_learns_routing(tmp_path):
    """Synthetic dataset: prompts of low token ids -> expert 0, high -> 1.
    After training, the gate must route accordingly."""
    cfg, params = _tiny(3)
    _, expert = _tiny(97)
    amoe = AnyMoeConfig(lr=0.05, epochs=300, gate_model_id=str(tmp_path / "gate"))
    moe_params = convert_to_anymoe(params, cfg, [expert], amoe)
    rng = np.random.default_rng(4)
    dataset = []
    for _ in range(8):
        dataset.append((rng.integers(3, 40, size=6).tolist(), 0))
        dataset.append((rng.integers(80, 120, size=6).tolist(), 1))
    rope = make_rope(cfg)
    trained = pretrain_gates(moe_params, cfg, rope, dataset, amoe)

    from mistralrs_tpu.amoe import collect_gating_inputs
    from mistralrs_tpu.lora.lora import unstack_groups

    layers = unstack_groups(trained)
    caps = collect_gating_inputs(trained, cfg, rope, [d[0] for d in dataset])
    correct = total = 0
    for li, arr in caps.items():
        gw = np.asarray(layers[li]["mlp"]["anymoe"]["gate"].data["w"], np.float32)
        offs = np.cumsum([0] + [len(d[0]) for d in dataset])
        for j, (_, label) in enumerate(dataset):
            pooled = arr[offs[j]:offs[j + 1]].mean(0)
            correct += int(np.argmax(pooled @ gw) == label)
            total += 1
    assert correct / total >= 0.9, f"routing accuracy {correct}/{total}"

    # gate.safetensors persisted and reloadable
    import os

    assert os.path.exists(tmp_path / "gate" / "gate.safetensors")
    fresh = convert_to_anymoe(params, cfg, [expert], amoe)
    reloaded = load_gates(str(tmp_path / "gate"), fresh)
    l1 = unstack_groups(trained)
    l2 = unstack_groups(reloaded)
    for li in caps:
        np.testing.assert_allclose(
            np.asarray(l1[li]["mlp"]["anymoe"]["gate"].data["w"]),
            np.asarray(l2[li]["mlp"]["anymoe"]["gate"].data["w"]),
            rtol=1e-6,
        )


def test_lora_adapter_experts_match_manual_merge():
    """AnyMoeExpertType::LoraAdapter (ref amoe/mod.rs:134): an adapter expert
    must behave exactly like a fine_tuned expert whose mlp weights are
    base + (alpha/r) * A@B."""
    from mistralrs_tpu.amoe import convert_to_anymoe_lora
    from mistralrs_tpu.lora.lora import LoraAdapter
    from mistralrs_tpu.lora.lora import unstack_groups
    from mistralrs_tpu.models.loader import group_layers
    from mistralrs_tpu.quant.qlinear import make_dense
    import dataclasses as dc

    cfg, params = _tiny(9)
    rng = np.random.default_rng(4)
    r, alpha = 4, 8.0
    weights = {}
    for i in range(cfg.num_layers):
        for proj, (inf, outf) in (("gate_proj", (32, 64)), ("down_proj", (64, 32))):
            A = (rng.standard_normal((r, inf)) * 0.1).astype(np.float32)
            B = (rng.standard_normal((outf, r)) * 0.1).astype(np.float32)
            weights[f"{i}.{proj}"] = (A, B)
    ad = LoraAdapter(name="x", r=r, alpha=alpha, weights=weights)

    moe_lora = convert_to_anymoe_lora(params, cfg, [ad], AnyMoeConfig(),
                                      rng=np.random.default_rng(1))

    # manual fine_tuned expert with merged weights
    layers = unstack_groups(params)
    for i, lp in enumerate(layers):
        for proj, key in (("gate_proj", "gate"), ("down_proj", "down")):
            A, B = weights[f"{i}.{proj}"]
            base = lp["mlp"][key]
            lp["mlp"][key] = make_dense(
                base.data["w"] + jnp.asarray((A.T @ B.T) * (alpha / r)))
    groups, sizes = group_layers(layers)
    expert = dc.replace(params, layer_groups=groups, group_sizes=sizes)
    moe_ft = convert_to_anymoe(params, cfg, [expert], AnyMoeConfig(),
                               rng=np.random.default_rng(1))

    rng2 = np.random.default_rng(0)
    prompt = rng2.integers(3, 120, size=9).tolist()
    a, _ = _engine(cfg, moe_lora).generate(prompt, SamplingParams(max_len=6))
    b, _ = _engine(cfg, moe_ft).generate(prompt, SamplingParams(max_len=6))
    assert a == b
