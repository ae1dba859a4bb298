"""Legacy GGML (ggjt) reader tests: craft a tiny ggjt file from an HF llama,
read it back, and check end-to-end generation tracks the f32 model."""

import json
import struct

import jax.numpy as jnp
import numpy as np
import torch
import transformers as tf

from mistralrs_tpu.gguf.ggml_reader import MAGIC_GGJT, load_ggml_model, read_ggml
from mistralrs_tpu.gguf.reader import GGMLType
from mistralrs_tpu.quant import kquants


def _write_ggjt(path, hparams, vocab, tensors):
    """tensors: {name: (np_weight(out,in) or 1d, GGMLType)}"""
    with open(path, "wb") as f:
        f.write(struct.pack("<II", MAGIC_GGJT, 3))
        f.write(struct.pack("<7I", *hparams))
        for tok, score in vocab:
            f.write(struct.pack("<I", len(tok)))
            f.write(tok)
            f.write(struct.pack("<f", score))
        for name, (w, gt) in tensors.items():
            if gt in (GGMLType.F32,):
                raw = np.ascontiguousarray(w.astype(np.float32)).view(np.uint8).ravel()
            else:
                raw = kquants.quantize(w.astype(np.float32), gt).ravel()
            dims = tuple(reversed(w.shape))  # ggml order
            nb = name.encode()
            f.write(struct.pack("<III", len(dims), len(nb), int(gt)))
            for d in dims:
                f.write(struct.pack("<I", d))
            f.write(nb)
            pos = f.tell()
            f.write(b"\0" * (((pos + 31) & ~31) - pos))
            f.write(raw.tobytes())


def _tiny_hf():
    torch.manual_seed(3)
    hf_cfg = tf.LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=128,
    )
    return hf_cfg, tf.LlamaForCausalLM(hf_cfg).eval().float()


def _ggml_tensors(model):
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    out = {
        "tok_embeddings.weight": (sd["model.embed_tokens.weight"], GGMLType.Q8_0),
        "norm.weight": (sd["model.norm.weight"], GGMLType.F32),
        "output.weight": (sd["lm_head.weight"], GGMLType.Q8_0),
    }
    n_layers = model.config.num_hidden_layers
    for i in range(n_layers):
        hf = f"model.layers.{i}."
        gg = f"layers.{i}."
        out[gg + "attention.wq.weight"] = (sd[hf + "self_attn.q_proj.weight"], GGMLType.Q8_0)
        out[gg + "attention.wk.weight"] = (sd[hf + "self_attn.k_proj.weight"], GGMLType.Q8_0)
        out[gg + "attention.wv.weight"] = (sd[hf + "self_attn.v_proj.weight"], GGMLType.Q8_0)
        out[gg + "attention.wo.weight"] = (sd[hf + "self_attn.o_proj.weight"], GGMLType.Q8_0)
        out[gg + "feed_forward.w1.weight"] = (sd[hf + "mlp.gate_proj.weight"], GGMLType.Q8_0)
        out[gg + "feed_forward.w3.weight"] = (sd[hf + "mlp.up_proj.weight"], GGMLType.Q8_0)
        out[gg + "feed_forward.w2.weight"] = (sd[hf + "mlp.down_proj.weight"], GGMLType.Q8_0)
        out[gg + "attention_norm.weight"] = (sd[hf + "input_layernorm.weight"], GGMLType.F32)
        out[gg + "ffn_norm.weight"] = (sd[hf + "post_attention_layernorm.weight"], GGMLType.F32)
    return out


def test_ggml_reader_roundtrip(tmp_path):
    hf_cfg, model = _tiny_hf()
    path = str(tmp_path / "tiny.ggjt")
    vocab = [(f"tok{i}".encode(), float(i)) for i in range(128)]
    _write_ggjt(path, (128, 64, 256, 4, 2, 16, 0), vocab, _ggml_tensors(model))
    ct = read_ggml(path)
    assert ct.hparams.n_vocab == 128 and ct.hparams.n_layer == 2
    assert len(ct.vocab) == 128 and ct.vocab[5][0] == b"tok5"
    t = ct.tensors["layers.0.attention.wq.weight"]
    assert t.shape == (64, 64) and t.gtype == GGMLType.Q8_0
    # dequant matches the original within Q8_0 tolerance
    w = kquants.dequantize(t.raw, t.gtype, t.shape)
    orig = model.state_dict()["model.layers.0.self_attn.q_proj.weight"].numpy()
    assert np.abs(w - orig).max() < 0.01


def test_ggml_model_generates_like_f32(tmp_path):
    hf_cfg, model = _tiny_hf()
    path = str(tmp_path / "tiny2.ggjt")
    vocab = [(f"tok{i}".encode(), 0.0) for i in range(128)]
    _write_ggjt(path, (128, 64, 256, 4, 2, 16, 0), vocab, _ggml_tensors(model))

    cfg, params, rope = load_ggml_model(path, gqa=2, dtype=jnp.float32)
    assert cfg.num_kv_heads == 2 and cfg.intermediate_size == 128

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                        prefill_buckets=(8, 16), dtype=jnp.float32)
    eng = Engine(TextPipeline(cfg, params, rope, pc), eos_token_ids=set())
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 120, size=9).tolist()
    toks, _ = eng.generate(prompt, SamplingParams(max_len=8))

    # exact oracle: HF model with the *dequantized* weights (what the file
    # actually stores), so the comparison isolates reader/pipeline fidelity
    ct = read_ggml(path)
    name_map = {
        "tok_embeddings.weight": "model.embed_tokens.weight",
        "norm.weight": "model.norm.weight",
        "output.weight": "lm_head.weight",
    }
    for i in range(2):
        gg, hf = f"layers.{i}.", f"model.layers.{i}."
        name_map.update({
            gg + "attention.wq.weight": hf + "self_attn.q_proj.weight",
            gg + "attention.wk.weight": hf + "self_attn.k_proj.weight",
            gg + "attention.wv.weight": hf + "self_attn.v_proj.weight",
            gg + "attention.wo.weight": hf + "self_attn.o_proj.weight",
            gg + "feed_forward.w1.weight": hf + "mlp.gate_proj.weight",
            gg + "feed_forward.w3.weight": hf + "mlp.up_proj.weight",
            gg + "feed_forward.w2.weight": hf + "mlp.down_proj.weight",
            gg + "attention_norm.weight": hf + "input_layernorm.weight",
            gg + "ffn_norm.weight": hf + "post_attention_layernorm.weight",
        })
    sd = dict(model.state_dict())
    for gname, hname in name_map.items():
        t = ct.tensors[gname]
        sd[hname] = torch.tensor(kquants.dequantize(t.raw, t.gtype, t.shape))
    model.load_state_dict(sd)
    with torch.no_grad():
        want = model.generate(torch.tensor([prompt]), max_new_tokens=8,
                              do_sample=False)[0, len(prompt):].tolist()
    assert toks == want
