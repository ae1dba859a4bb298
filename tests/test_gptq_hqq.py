"""GPTQ + HQQ quantization tests: pack/unpack roundtrips, dequant numerics,
HQQ proximal optimizer quality, checkpoint loading, engine e2e."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from mistralrs_tpu.quant.gptq import (
    _pack_bytes_rows,
    _unpack_3bit_rows,
    _unpack_int32_cols,
    _unpack_int32_rows,
    gptq_linear_from_tensors,
    quantize_gptq_rtn,
)
from mistralrs_tpu.quant.hqq import HqqType, hqq_dequant_weights, quantize_hqq
from mistralrs_tpu.quant.qlinear import linear


# ------------------------------------------------------------- pack roundtrip
@pytest.mark.parametrize("bits", [2, 4, 8])
def test_int32_row_pack_roundtrip(bits):
    rng = np.random.default_rng(0)
    per = 32 // bits
    vals = rng.integers(0, 1 << bits, size=(per * 6, 10)).astype(np.uint8)
    packed = np.zeros((6, 10), np.uint32)
    for j in range(per):
        packed |= vals[j::per].astype(np.uint32) << (bits * j)
    got = _unpack_int32_rows(packed.astype(np.int32), bits, vals.shape[0])
    np.testing.assert_array_equal(got, vals)


def test_3bit_roundtrip():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 8, size=(64, 5)).astype(np.uint8)  # 2 triples of 32
    packed = np.zeros((6, 5), np.uint32)
    for t in range(2):
        for j in range(32):
            bitpos = 3 * j
            word, off = divmod(bitpos, 32)
            v = vals[t * 32 + j].astype(np.uint64)
            packed[t * 3 + word] |= (v << off).astype(np.uint64) & 0xFFFFFFFF
            if off > 29:  # straddles into the next word
                packed[t * 3 + word + 1] |= (v >> (32 - off)).astype(np.uint32)
    got = _unpack_3bit_rows(packed.astype(np.int32), 64)
    np.testing.assert_array_equal(got, vals)


@pytest.mark.parametrize("bits", [1, 2, 4])
def test_byte_pack_roundtrip(bits):
    rng = np.random.default_rng(2)
    per = 8 // bits
    vals = rng.integers(0, 1 << bits, size=(per * 8, 6)).astype(np.uint8)
    packed = _pack_bytes_rows(vals, bits)
    # unpack the way the forward does (plane-major: plane j = chunk j)
    parts = [((packed >> (bits * j)) & ((1 << bits) - 1)) for j in range(per)]
    got = np.concatenate(parts, axis=0)
    np.testing.assert_array_equal(got, vals)


# ------------------------------------------------------------- gptq numerics
@pytest.mark.parametrize("bits", [2, 4, 8])
def test_gptq_rtn_roundtrip_error(bits):
    rng = np.random.default_rng(3)
    w = rng.standard_normal((32, 256)).astype(np.float32)  # (out, in)
    t = quantize_gptq_rtn(w, bits, group_size=64)
    lin = gptq_linear_from_tensors(
        t["qweight"], t["qzeros"], t["scales"].astype(np.float32), t["g_idx"],
        bits, 256, 32, dtype=jnp.float32,
    )
    from mistralrs_tpu.quant.gptq import _gptq_weights

    wt = np.asarray(_gptq_weights(lin, jnp.float32, bits))  # [in, out]
    err = np.abs(wt.T - w).mean()
    # quantization error bounded by ~half a step per group
    steps = (w.max(axis=1) - w.min(axis=1)) / ((1 << bits) - 1)
    assert err <= steps.mean(), (err, steps.mean())


def test_gptq_forward_matches_dequant_matmul():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((16, 128)).astype(np.float32)
    t = quantize_gptq_rtn(w, 4, group_size=32)
    lin = gptq_linear_from_tensors(
        t["qweight"], t["qzeros"], t["scales"].astype(np.float32), t["g_idx"],
        4, 128, 16, dtype=jnp.float32,
    )
    x = rng.standard_normal((3, 128)).astype(np.float32)
    y = np.asarray(linear(lin, jnp.asarray(x)))
    from mistralrs_tpu.quant.gptq import _gptq_weights

    want = x @ np.asarray(_gptq_weights(lin, jnp.float32, 4))
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)


def test_gptq_act_order_hoisted_perm():
    """Shuffled g_idx: forward must equal the gather-formula matmul, with the
    gather hoisted to load time (no per-step g_idx gather, only in_perm)."""
    rng = np.random.default_rng(5)
    w = rng.standard_normal((8, 64)).astype(np.float32)
    t = quantize_gptq_rtn(w, 4, group_size=16)
    perm = rng.permutation(64)
    g_idx = t["g_idx"][perm]
    lin = gptq_linear_from_tensors(
        t["qweight"], t["qzeros"], t["scales"].astype(np.float32), g_idx,
        4, 64, 8, dtype=jnp.float32,
    )
    assert "g_idx" not in lin.data  # hoisted: no runtime scale gather
    assert "in_perm" in lin.data

    q = _unpack_int32_rows(t["qweight"], 4, 64)
    zeros = _unpack_int32_cols(t["qzeros"], 4, 8) + 1
    s = t["scales"].astype(np.float32)
    want_w = q.astype(np.float32) * s[g_idx] - s[g_idx] * zeros.astype(np.float32)[g_idx]
    x = rng.standard_normal((3, 64)).astype(np.float32)
    y = np.asarray(linear(lin, jnp.asarray(x)))
    np.testing.assert_allclose(y, x @ want_w, rtol=1e-4, atol=1e-4)


def test_gptq_act_order_ragged_groups_fallback():
    """Non-equal group sizes cannot be row-sorted into uniform groups; the
    runtime gather fallback must stay numerically exact."""
    rng = np.random.default_rng(15)
    w = rng.standard_normal((8, 64)).astype(np.float32)
    t = quantize_gptq_rtn(w, 4, group_size=16)
    g_idx = t["g_idx"].copy()
    g_idx[0] = 3  # unbalance group counts (group0=15, group3=17)
    lin = gptq_linear_from_tensors(
        t["qweight"], t["qzeros"], t["scales"].astype(np.float32), g_idx,
        4, 64, 8, dtype=jnp.float32,
    )
    assert "g_idx" in lin.data and "in_perm" not in lin.data
    from mistralrs_tpu.quant.gptq import _gptq_weights

    wt = np.asarray(_gptq_weights(lin, jnp.float32, 4))
    q = _unpack_int32_rows(t["qweight"], 4, 64)
    zeros = _unpack_int32_cols(t["qzeros"], 4, 8) + 1
    s = t["scales"].astype(np.float32)
    want = q.astype(np.float32) * s[g_idx] - s[g_idx] * zeros.astype(np.float32)[g_idx]
    np.testing.assert_allclose(wt, want, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- hqq
@pytest.mark.parametrize("bits", [1, 2, 3, 4, 8])
def test_hqq_roundtrip_all_bits(bits):
    rng = np.random.default_rng(6)
    w = rng.standard_normal((16, 128)).astype(np.float32)
    lin = quantize_hqq(w, bits, group_size=32, dtype=jnp.float32)
    wt = np.asarray(hqq_dequant_weights(lin, jnp.float32, bits))
    err = np.abs(wt.T - w).mean()
    bound = {1: 0.9, 2: 0.5, 3: 0.25, 4: 0.12, 8: 0.01}[bits]
    assert err < bound, (bits, err)


def test_hqq_beats_rtn():
    """The proximal optimizer must not be worse than plain round-to-nearest
    on a heavy-tailed weight distribution (HQQ's design target)."""
    rng = np.random.default_rng(7)
    w = rng.standard_normal((32, 256)).astype(np.float32)
    w[rng.uniform(size=w.shape) < 0.01] *= 8  # outliers
    opt = quantize_hqq(w, 4, group_size=64, iters=20, dtype=jnp.float32)
    rtn = quantize_hqq(w, 4, group_size=64, iters=0, dtype=jnp.float32)
    e_opt = np.abs(np.asarray(hqq_dequant_weights(opt, jnp.float32, 4)).T - w)
    e_rtn = np.abs(np.asarray(hqq_dequant_weights(rtn, jnp.float32, 4)).T - w)
    # HQQ optimizes an lp objective; compare on robust error
    assert np.median(e_opt) <= np.median(e_rtn) * 1.02


def test_hqq_isq_parse_and_model_load():
    from mistralrs_tpu.quant.isq import parse_isq

    t = parse_isq("HQQ4")
    assert isinstance(t, HqqType) and t.bits == 4
    with pytest.raises(ValueError):
        parse_isq("HQQ5")


def _tiny_hf(tmp_path, quant=None):
    import torch
    import transformers as tf

    torch.manual_seed(3)
    hf_cfg = tf.LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=128,
    )
    model = tf.LlamaForCausalLM(hf_cfg).eval().float()
    return hf_cfg, model


def test_hqq_isq_engine_end_to_end():
    """HQQ8-ISQ'd model greedy-decodes nearly like the f32 model."""
    import torch

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    hf_cfg, model = _tiny_hf(None)
    cfg = config_from_hf(json.loads(hf_cfg.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                        prefill_buckets=(8, 16), dtype=jnp.float32)

    def eng(isq):
        params = params_from_source(
            cfg, TensorSource.from_dict(sd), dtype=jnp.float32, isq=isq
        )
        return Engine(TextPipeline(cfg, params, make_rope(cfg), pc), eos_token_ids=set())

    rng = np.random.default_rng(8)
    prompt = rng.integers(3, 120, size=9).tolist()
    base, _ = eng(None).generate(prompt, SamplingParams(max_len=8))
    q8, _ = eng("HQQ8").generate(prompt, SamplingParams(max_len=8))
    # 8-bit HQQ should track the fp model greedy tokens on a tiny net
    assert q8 == base


def test_gptq_checkpoint_loads_through_loader(tmp_path):
    """Write an AutoGPTQ-format checkpoint dir and load via load_hf_model."""
    import torch

    from mistralrs_tpu.models.loader import load_hf_model

    hf_cfg, model = _tiny_hf(tmp_path)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    tensors = {}
    for k, v in sd.items():
        m = [p for p in ("q_proj", "k_proj", "v_proj", "o_proj",
                         "gate_proj", "up_proj", "down_proj") if f"{p}.weight" in k]
        if m:
            t = quantize_gptq_rtn(v, 4, group_size=32)
            base = k[: -len(".weight")]
            for name, arr in t.items():
                tensors[f"{base}.{name}"] = arr
        else:
            tensors[k] = v
    from safetensors.numpy import save_file

    d = tmp_path / "gptq_ckpt"
    d.mkdir()
    save_file(tensors, str(d / "model.safetensors"))
    cfg_json = json.loads(hf_cfg.to_json_string())
    cfg_json["quantization_config"] = {"quant_method": "gptq", "bits": 4, "group_size": 32}
    (d / "config.json").write_text(json.dumps(cfg_json))

    cfg, params, rope = load_hf_model(str(d), dtype=jnp.float32)
    kinds = set()
    from mistralrs_tpu.quant.qlinear import Linear

    import jax

    for leaf in jax.tree.leaves(params, is_leaf=lambda x: isinstance(x, Linear)):
        if isinstance(leaf, Linear):
            kinds.add(leaf.kind)
    assert "gptq_4" in kinds

    # and it decodes tokens close to the fp32 model
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import TensorSource, params_from_source
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                        prefill_buckets=(8, 16), dtype=jnp.float32)
    eng = Engine(TextPipeline(cfg, params, rope, pc), eos_token_ids=set())
    rng = np.random.default_rng(9)
    prompt = rng.integers(3, 120, size=9).tolist()
    toks, _ = eng.generate(prompt, SamplingParams(max_len=6))
    assert len(toks) == 6 and all(0 <= t < 128 for t in toks)


def test_gptq4_rides_q4k_kernel_format():
    """4-bit contiguous-group GPTQ converts into the fused Q4_K device
    format; forward must match the generic dequant reference."""
    rng = np.random.default_rng(10)
    w = rng.standard_normal((64, 512)).astype(np.float32)
    t = quantize_gptq_rtn(w, 4, group_size=64)
    lin = gptq_linear_from_tensors(
        t["qweight"], t["qzeros"], t["scales"].astype(np.float32), t["g_idx"],
        4, 512, 64, dtype=jnp.float32,
    )
    assert lin.kind == "gguf_q4k"
    x = rng.standard_normal((3, 512)).astype(np.float32)
    got = np.asarray(linear(lin, jnp.asarray(x)))
    # reference: rebuild via the plain gptq path (small in_f forces it)
    q = _unpack_int32_rows(t["qweight"], 4, 512)
    zeros = _unpack_int32_cols(t["qzeros"], 4, 64).astype(np.float32) + 1
    s = t["scales"].astype(np.float32)
    wt = q.astype(np.float32) * np.repeat(s, 64, 0) - np.repeat(s * zeros, 64, 0)
    np.testing.assert_allclose(got, x @ wt, rtol=2e-4, atol=2e-4)


def test_hqq4_rides_q4k_kernel_format():
    rng = np.random.default_rng(11)
    w = rng.standard_normal((32, 512)).astype(np.float32)
    lin = quantize_hqq(w, 4, group_size=64, dtype=jnp.float32)
    assert lin.kind == "gguf_q4k"
    x = rng.standard_normal((2, 512)).astype(np.float32)
    y = np.asarray(linear(lin, jnp.asarray(x)))
    from mistralrs_tpu.quant.gguf_linear import dequant_q4k_weights

    wt = np.asarray(dequant_q4k_weights(lin, jnp.float32))  # [out, in]
    np.testing.assert_allclose(y, x @ wt.T, rtol=2e-4, atol=2e-4)
    # and the dequant tracks the original weights within 4-bit error
    assert np.abs(wt - w).mean() < 0.1


# --------------------------------------------------- act-order x fusion
def _act_order_lin(rng, in_f=64, out_f=32, seed_w=None):
    w = (seed_w if seed_w is not None
         else rng.standard_normal((out_f, in_f)).astype(np.float32))
    t = quantize_gptq_rtn(w, 4, group_size=16)
    perm = rng.permutation(in_f)
    g_idx = t["g_idx"][perm]
    q = _unpack_int32_rows(t["qweight"], 4, in_f)[perm]
    pack = np.zeros((in_f // 8, out_f), np.int32)
    for i in range(8):
        pack |= q[i::8].astype(np.int32) << (4 * i)
    lin = gptq_linear_from_tensors(pack, t["qzeros"], t["scales"].astype(np.float32),
                                   g_idx, 4, in_f, out_f, dtype=jnp.float32)
    zeros = _unpack_int32_cols(t["qzeros"], 4, out_f).astype(np.float32) + 1
    s = t["scales"].astype(np.float32)
    wt = q.astype(np.float32) * s[g_idx] - (s * zeros)[g_idx]
    return lin, wt


def test_fuse_refuses_mismatched_act_order_perms():
    """q/k/v from a desc_act checkpoint each sort rows by their OWN g_idx;
    fusing them would concatenate differently-ordered rows and drop the
    per-linear input gather (silent wrong results — caught by an engine
    drive, 0/12 greedy tokens matched torch before this guard)."""
    from mistralrs_tpu.quant.fuse import fuse_linears

    rng = np.random.default_rng(21)
    l1, wt1 = _act_order_lin(rng)
    l2, wt2 = _act_order_lin(rng)
    assert "in_perm" in l1.data and "in_perm" in l2.data
    assert fuse_linears([l1, l2]) is None


def test_fuse_shared_act_order_perm_matches_concat():
    """Identical in_perms ARE fusable: the shared gather hoists past the
    fused GEMM."""
    from mistralrs_tpu.quant.fuse import fuse_linears

    rng = np.random.default_rng(22)
    in_f = 64
    w1 = rng.standard_normal((32, in_f)).astype(np.float32)
    w2 = rng.standard_normal((32, in_f)).astype(np.float32)
    t1 = quantize_gptq_rtn(w1, 4, group_size=16)
    t2 = quantize_gptq_rtn(w2, 4, group_size=16)
    perm = rng.permutation(in_f)

    def build(t, out_f):
        g_idx = t["g_idx"][perm]
        q = _unpack_int32_rows(t["qweight"], 4, in_f)[perm]
        pack = np.zeros((in_f // 8, out_f), np.int32)
        for i in range(8):
            pack |= q[i::8].astype(np.int32) << (4 * i)
        return gptq_linear_from_tensors(pack, t["qzeros"],
                                        t["scales"].astype(np.float32), g_idx,
                                        4, in_f, out_f, dtype=jnp.float32)

    l1, l2 = build(t1, 32), build(t2, 32)
    fused = fuse_linears([l1, l2])
    assert fused is not None and "in_perm" in fused.data
    x = rng.standard_normal((3, in_f)).astype(np.float32)
    got = np.asarray(linear(fused, jnp.asarray(x)))
    want = np.concatenate(
        [np.asarray(linear(l1, jnp.asarray(x))), np.asarray(linear(l2, jnp.asarray(x)))],
        axis=-1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gptq_act_order_engine_matches_torch(tmp_path):
    """E2E: a desc_act AutoGPTQ checkpoint served through the ENGINE (which
    fuses q/k/v and gate/up) must greedy-decode exactly like torch running
    the dequantized weights. Regression for the fuse+in_perm bug."""
    import torch
    import transformers as tf

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import load_hf_model
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline
    from safetensors.numpy import save_file

    torch.manual_seed(7)
    hf_cfg = tf.LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=2, max_position_embeddings=256)
    model = tf.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
    rng = np.random.default_rng(3)
    tensors = {}
    with torch.no_grad():
        for k, v in sd.items():
            hit = any(f"{p}.weight" in k for p in
                      ("q_proj", "k_proj", "v_proj", "o_proj",
                       "gate_proj", "up_proj", "down_proj"))
            if not hit:
                tensors[k] = v
                continue
            t = quantize_gptq_rtn(v, 4, group_size=16)
            in_f = v.shape[1]
            perm = rng.permutation(in_f)
            g_idx = t["g_idx"][perm]
            q = _unpack_int32_rows(t["qweight"], 4, in_f)[perm]
            pack = np.zeros((in_f // 8, v.shape[0]), np.int32)
            for i in range(8):
                pack |= q[i::8].astype(np.int32) << (4 * i)
            base = k[: -len(".weight")]
            tensors[f"{base}.qweight"] = pack
            tensors[f"{base}.qzeros"] = t["qzeros"]
            tensors[f"{base}.scales"] = t["scales"]
            tensors[f"{base}.g_idx"] = g_idx.astype(np.int32)
            zeros = _unpack_int32_cols(t["qzeros"], 4, v.shape[0]).astype(np.float32) + 1
            s = t["scales"].astype(np.float32)
            wt = q.astype(np.float32) * s[g_idx] - (s * zeros)[g_idx]
            dict(model.named_parameters())[k].copy_(torch.from_numpy(wt.T))
    d = tmp_path / "gptq_desc_act"
    d.mkdir()
    save_file(tensors, str(d / "model.safetensors"))
    cj = json.loads(hf_cfg.to_json_string())
    cj["quantization_config"] = {"quant_method": "gptq", "bits": 4,
                                 "group_size": 16, "desc_act": True}
    (d / "config.json").write_text(json.dumps(cj))

    cfg, params, rope = load_hf_model(str(d), dtype=jnp.float32)
    pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                        prefill_buckets=(8, 16), dtype=jnp.float32)
    eng = Engine(TextPipeline(cfg, params, rope, pc), eos_token_ids=set())
    prompt = np.random.default_rng(11).integers(3, 120, size=9).tolist()
    toks, _ = eng.generate(prompt, SamplingParams(max_len=12))
    import torch as _torch
    with _torch.no_grad():
        want = model.generate(_torch.tensor([prompt]), max_new_tokens=12,
                              do_sample=False)[0, 9:].tolist()
    assert toks == want
