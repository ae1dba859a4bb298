"""End-to-end GGUF: write a quantized tiny-llama GGUF, load it, serve it.

The quantized engine's generation must match a dense model built from the
*dequantized* weights exactly (same numbers, different storage). Mixed
Q4_K/Q6_K per-layer kinds exercise the grouped-scan path (GGUF Q4_K_M
alternates kinds across layers)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.gguf.reader import GGMLType, GGUFFile
from mistralrs_tpu.gguf.writer import write_gguf
from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
from mistralrs_tpu.pipeline.gguf import load_gguf_model
from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline
from mistralrs_tpu.quant import kquants

H, I, L, HEADS, KV, V = 256, 512, 3, 4, 2, 96
D = H // HEADS


def _weights(seed=0):
    rng = np.random.default_rng(seed)

    def t(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w = {"token_embd.weight": t(V, H), "output_norm.weight": np.ones(H, np.float32),
         "output.weight": t(V, H)}
    for i in range(L):
        p = f"blk.{i}"
        w[f"{p}.attn_q.weight"] = t(HEADS * D, H)
        w[f"{p}.attn_k.weight"] = t(KV * D, H)
        w[f"{p}.attn_v.weight"] = t(KV * D, H)
        w[f"{p}.attn_output.weight"] = t(H, HEADS * D)
        w[f"{p}.ffn_gate.weight"] = t(I, H)
        w[f"{p}.ffn_up.weight"] = t(I, H)
        w[f"{p}.ffn_down.weight"] = t(H, I)
        w[f"{p}.attn_norm.weight"] = np.ones(H, np.float32)
        w[f"{p}.ffn_norm.weight"] = np.ones(H, np.float32)
    return w


def _qtype_for(name: str, layer_mixed: bool) -> GGMLType:
    if "norm" in name:
        return GGMLType.F32
    if layer_mixed:
        # alternate kinds across layers like Q4_K_M does
        if name.startswith("blk.1.") and ("ffn_down" in name or "attn_v" in name):
            return GGMLType.Q6_K
        if "ffn" in name or "attn" in name:
            return GGMLType.Q4_K
    return GGMLType.Q8_0


def _write_model_gguf(path, weights, layer_mixed=True):
    tensors = {}
    for name, w in weights.items():
        gt = _qtype_for(name, layer_mixed)
        if gt == GGMLType.F32:
            tensors[name] = (gt, w.shape, w)
        else:
            tensors[name] = (gt, w.shape, kquants.quantize(w, gt))
    md = {
        "general.architecture": "llama",
        "llama.block_count": L,
        "llama.embedding_length": H,
        "llama.feed_forward_length": I,
        "llama.attention.head_count": HEADS,
        "llama.attention.head_count_kv": KV,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "llama.rope.freq_base": 10000.0,
        "llama.context_length": 128,
        "llama.vocab_size": V,
    }
    write_gguf(path, md, tensors)
    return tensors


def _dense_params_from_dequant(gguf_path):
    """Build dense params from the GGUF's dequantized weights (exact baseline)."""
    g = GGUFFile(gguf_path)
    sd = {}
    name_map = {
        "token_embd.weight": "model.embed_tokens.weight",
        "output_norm.weight": "model.norm.weight",
        "output.weight": "lm_head.weight",
    }
    for i in range(L):
        name_map.update({
            f"blk.{i}.attn_q.weight": f"model.layers.{i}.self_attn.q_proj.weight",
            f"blk.{i}.attn_k.weight": f"model.layers.{i}.self_attn.k_proj.weight",
            f"blk.{i}.attn_v.weight": f"model.layers.{i}.self_attn.v_proj.weight",
            f"blk.{i}.attn_output.weight": f"model.layers.{i}.self_attn.o_proj.weight",
            f"blk.{i}.ffn_gate.weight": f"model.layers.{i}.mlp.gate_proj.weight",
            f"blk.{i}.ffn_up.weight": f"model.layers.{i}.mlp.up_proj.weight",
            f"blk.{i}.ffn_down.weight": f"model.layers.{i}.mlp.down_proj.weight",
            f"blk.{i}.attn_norm.weight": f"model.layers.{i}.input_layernorm.weight",
            f"blk.{i}.ffn_norm.weight": f"model.layers.{i}.post_attention_layernorm.weight",
        })
    for gname, hname in name_map.items():
        sd[hname] = g.tensor_f32(gname)
    cfg = ModelConfig(
        arch="llama", vocab_size=V, hidden_size=H, intermediate_size=I, num_layers=L,
        num_heads=HEADS, num_kv_heads=KV, head_dim=D, max_position_embeddings=128,
    )
    return cfg, params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)


def _engine(cfg, params):
    pipe = TextPipeline(
        cfg, params, make_rope(cfg),
        PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                       prefill_buckets=(8, 16), dtype=jnp.float32),
    )
    return Engine(pipe, eos_token_ids=set())


def test_gguf_end_to_end_matches_dequantized_dense(tmp_path):
    path = str(tmp_path / "model.gguf")
    _write_model_gguf(path, _weights())
    cfg, params, rope, tok = load_gguf_model(path, dtype=jnp.float32)
    assert cfg.num_layers == L and cfg.vocab_size == V
    assert len(params.group_sizes) >= 2, "mixed kinds should split scan groups"

    dcfg, dparams = _dense_params_from_dequant(path)
    prompt = np.random.default_rng(1).integers(1, V - 1, size=11).tolist()
    got, _ = _engine(cfg, params).generate(prompt, SamplingParams(max_len=8))
    want, _ = _engine(dcfg, dparams).generate(prompt, SamplingParams(max_len=8))
    assert got == want


def test_gguf_tokenizer_conversion_unigram():
    from mistralrs_tpu.gguf.tokenizer import convert_gguf_tokenizer

    # tiny sentencepiece-like vocab with byte fallback
    tokens = ["<unk>", "<s>", "</s>", "▁hello", "▁world", "lo", "l", "o", "▁h", "e"]
    tokens += [f"<0x{i:02X}>" for i in range(256)]
    scores = [0.0, 0.0, 0.0, -1.0, -1.5, -3.0, -5.0, -5.0, -4.0, -5.0] + [-10.0] * 256
    ttypes = [2, 3, 3] + [1] * 7 + [6] * 256
    md = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": np.asarray(scores, np.float32),
        "tokenizer.ggml.token_type": np.asarray(ttypes, np.int32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
    }
    tw = convert_gguf_tokenizer(md)
    ids = tw.encode("hello world", add_special_tokens=False)
    assert tw.decode(ids) == "hello world"
    assert tw.eos_token_ids == {2}
    assert tw.bos_token == "<s>"


# ---------------------------------------------------------------- new archs
# (ref pipeline/gguf.rs:59-66 serves QPhi/QPhi3/QStarcoder2 + Mixtral GGUF)


def _t(rng, *shape):
    return (rng.standard_normal(shape) * 0.05).astype(np.float32)


def _ones(*shape):
    return np.ones(shape, np.float32)


def _quantize_tensors(weights, qtype=GGMLType.Q8_0):
    """norms/biases/small stay F32; 2D matmul weights quantize; 3D expert
    stacks quantize per expert slice."""
    tensors = {}
    for name, w in weights.items():
        if "norm" in name or name.endswith(".bias") or "gate_inp" in name or w.ndim == 1:
            tensors[name] = (GGMLType.F32, w.shape, w)
        elif w.ndim == 3:
            raw = np.concatenate([kquants.quantize(w[e], qtype).ravel() for e in range(w.shape[0])])
            tensors[name] = (qtype, w.shape, raw)
        else:
            tensors[name] = (qtype, w.shape, kquants.quantize(w, qtype))
    return tensors


def _dense_baseline(path, monkeypatch):
    """Load the same GGUF with packers disabled: every weight dequantizes to
    a dense Linear through the identical code path (exact baseline)."""
    from mistralrs_tpu.quant import gguf_linear

    monkeypatch.setattr(gguf_linear, "PACKERS", {})
    cfg, params, rope, _ = load_gguf_model(path, dtype=jnp.float32)
    monkeypatch.undo()
    return cfg, params, rope


def _gen_parity(path, monkeypatch, n_prompt=9, max_len=6):
    cfg, params, rope, _ = load_gguf_model(path, dtype=jnp.float32)
    dcfg, dparams, _ = _dense_baseline(path, monkeypatch)
    prompt = np.random.default_rng(5).integers(1, cfg.vocab_size - 1, size=n_prompt).tolist()
    got, _ = _engine(cfg, params).generate(prompt, SamplingParams(max_len=max_len))
    want, _ = _engine(dcfg, dparams).generate(prompt, SamplingParams(max_len=max_len))
    assert got == want
    return cfg


def test_gguf_phi2_end_to_end(tmp_path, monkeypatch):
    rng = np.random.default_rng(11)
    rope_dim = 32
    w = {"token_embd.weight": _t(rng, V, H),
         "output_norm.weight": _ones(H), "output_norm.bias": _t(rng, H),
         "output.weight": _t(rng, V, H), "output.bias": _t(rng, V)}
    qkv = (HEADS + 2 * KV) * D
    for i in range(L):
        p = f"blk.{i}"
        w[f"{p}.attn_qkv.weight"] = _t(rng, qkv, H)
        w[f"{p}.attn_qkv.bias"] = _t(rng, qkv)
        w[f"{p}.attn_output.weight"] = _t(rng, H, HEADS * D)
        w[f"{p}.attn_output.bias"] = _t(rng, H)
        w[f"{p}.ffn_up.weight"] = _t(rng, I, H)
        w[f"{p}.ffn_up.bias"] = _t(rng, I)
        w[f"{p}.ffn_down.weight"] = _t(rng, H, I)
        w[f"{p}.ffn_down.bias"] = _t(rng, H)
        w[f"{p}.attn_norm.weight"] = _ones(H)
        w[f"{p}.attn_norm.bias"] = _t(rng, H)
    md = {
        "general.architecture": "phi2",
        "phi2.block_count": L, "phi2.embedding_length": H,
        "phi2.feed_forward_length": I, "phi2.attention.head_count": HEADS,
        "phi2.attention.head_count_kv": KV,
        "phi2.attention.layer_norm_epsilon": 1e-5,
        "phi2.rope.dimension_count": rope_dim, "phi2.context_length": 128,
        "phi2.vocab_size": V,
    }
    path = str(tmp_path / "phi2.gguf")
    write_gguf(path, md, _quantize_tensors(w))
    cfg = _gen_parity(path, monkeypatch)
    assert cfg.arch == "phi2" and cfg.block_style == "parallel"
    assert cfg.partial_rotary_factor == rope_dim / D and cfg.lm_head_bias


def test_gguf_phi3_end_to_end(tmp_path, monkeypatch):
    rng = np.random.default_rng(12)
    w = {"token_embd.weight": _t(rng, V, H), "output_norm.weight": _ones(H),
         "output.weight": _t(rng, V, H)}
    qkv = (HEADS + 2 * KV) * D
    for i in range(L):
        p = f"blk.{i}"
        w[f"{p}.attn_qkv.weight"] = _t(rng, qkv, H)
        w[f"{p}.attn_output.weight"] = _t(rng, H, HEADS * D)
        w[f"{p}.ffn_up.weight"] = _t(rng, 2 * I, H)  # fused gate|up
        w[f"{p}.ffn_down.weight"] = _t(rng, H, I)
        w[f"{p}.attn_norm.weight"] = _ones(H)
        w[f"{p}.ffn_norm.weight"] = _ones(H)
    md = {
        "general.architecture": "phi3",
        "phi3.block_count": L, "phi3.embedding_length": H,
        "phi3.feed_forward_length": I, "phi3.attention.head_count": HEADS,
        "phi3.attention.head_count_kv": KV,
        "phi3.attention.layer_norm_rms_epsilon": 1e-5,
        "phi3.rope.dimension_count": D, "phi3.context_length": 128,
        "phi3.vocab_size": V,
    }
    path = str(tmp_path / "phi3.gguf")
    write_gguf(path, md, _quantize_tensors(w))
    cfg = _gen_parity(path, monkeypatch)
    assert cfg.arch == "phi3"


def test_gguf_starcoder2_end_to_end(tmp_path, monkeypatch):
    rng = np.random.default_rng(13)
    # no output.weight: tied embeddings (quantized_starcoder2.rs ties too)
    w = {"token_embd.weight": _t(rng, V, H),
         "output_norm.weight": _ones(H), "output_norm.bias": _t(rng, H)}
    for i in range(L):
        p = f"blk.{i}"
        for nm, shape in (("attn_q", (HEADS * D, H)), ("attn_k", (KV * D, H)),
                          ("attn_v", (KV * D, H)), ("attn_output", (H, HEADS * D)),
                          ("ffn_up", (I, H)), ("ffn_down", (H, I))):
            w[f"{p}.{nm}.weight"] = _t(rng, *shape)
            w[f"{p}.{nm}.bias"] = _t(rng, shape[0])
        w[f"{p}.attn_norm.weight"] = _ones(H)
        w[f"{p}.attn_norm.bias"] = _t(rng, H)
        w[f"{p}.ffn_norm.weight"] = _ones(H)
        w[f"{p}.ffn_norm.bias"] = _t(rng, H)
    md = {
        "general.architecture": "starcoder2",
        "starcoder2.block_count": L, "starcoder2.embedding_length": H,
        "starcoder2.feed_forward_length": I,
        "starcoder2.attention.head_count": HEADS,
        "starcoder2.attention.head_count_kv": KV,
        "starcoder2.attention.layer_norm_epsilon": 1e-5,
        "starcoder2.context_length": 128, "starcoder2.vocab_size": V,
    }
    path = str(tmp_path / "sc2.gguf")
    write_gguf(path, md, _quantize_tensors(w))
    cfg = _gen_parity(path, monkeypatch)
    assert cfg.arch == "starcoder2" and cfg.tie_word_embeddings


@pytest.mark.parametrize("naming", ["exps", "per_expert"])
def test_gguf_mixtral_moe(tmp_path, monkeypatch, naming):
    """MoE GGUF (ref quantized_llama.rs:473-530): stacked ffn_*_exps or
    legacy per-expert tensors; packed experts vs dequantized-dense logits."""
    import jax

    from mistralrs_tpu.models.decoder import compute_logits, decoder_forward
    from mistralrs_tpu.ops.kv_cache import AttnMeta, KVCache

    rng = np.random.default_rng(14)
    E, K_used = 4, 2
    w = {"token_embd.weight": _t(rng, V, H), "output_norm.weight": _ones(H),
         "output.weight": _t(rng, V, H)}
    for i in range(L):
        p = f"blk.{i}"
        w[f"{p}.attn_q.weight"] = _t(rng, HEADS * D, H)
        w[f"{p}.attn_k.weight"] = _t(rng, KV * D, H)
        w[f"{p}.attn_v.weight"] = _t(rng, KV * D, H)
        w[f"{p}.attn_output.weight"] = _t(rng, H, HEADS * D)
        w[f"{p}.ffn_gate_inp.weight"] = _t(rng, E, H)
        if naming == "exps":
            w[f"{p}.ffn_gate_exps.weight"] = _t(rng, E, I, H)
            w[f"{p}.ffn_up_exps.weight"] = _t(rng, E, I, H)
            w[f"{p}.ffn_down_exps.weight"] = _t(rng, E, H, I)
        else:
            for e in range(E):
                w[f"{p}.ffn_gate.{e}.weight"] = _t(rng, I, H)
                w[f"{p}.ffn_up.{e}.weight"] = _t(rng, I, H)
                w[f"{p}.ffn_down.{e}.weight"] = _t(rng, H, I)
        w[f"{p}.attn_norm.weight"] = _ones(H)
        w[f"{p}.ffn_norm.weight"] = _ones(H)
    md = {
        "general.architecture": "llama",
        "llama.block_count": L, "llama.embedding_length": H,
        "llama.feed_forward_length": I, "llama.attention.head_count": HEADS,
        "llama.attention.head_count_kv": KV,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "llama.context_length": 128, "llama.vocab_size": V,
        "llama.expert_count": E, "llama.expert_used_count": K_used,
    }
    path = str(tmp_path / "mixtral.gguf")
    write_gguf(path, md, _quantize_tensors(w))
    cfg, params, rope, _ = load_gguf_model(path, dtype=jnp.float32)
    assert cfg.arch == "mixtral" and cfg.num_experts == E
    dcfg, dparams, drope = _dense_baseline(path, monkeypatch)

    ids = jnp.asarray([np.random.default_rng(3).integers(1, V - 1, size=8)])

    def logits_of(c, prm, rp):
        cache = KVCache.create(c.num_layers, 1, 16, c.num_kv_heads, c.head_dim,
                               jnp.float32)
        meta = AttnMeta(positions=jnp.arange(8)[None], write_pos=jnp.asarray([0]),
                        kv_lens=jnp.asarray([8]), active=jnp.ones(1))
        h, _ = decoder_forward(prm, c, rp, ids, cache, meta)
        return np.asarray(compute_logits(prm, c, h))

    np.testing.assert_allclose(
        logits_of(cfg, params, rope), logits_of(dcfg, dparams, drope),
        rtol=2e-4, atol=2e-4,
    )


def test_gguf_reader_rejects_malformed_files(tmp_path):
    """Malformed GGUF inputs must raise clean ValueErrors (a serving CLI
    pointed at a bad file should print the reason, not crash deep in
    struct unpacking or allocate absurd buffers)."""
    import pytest

    from mistralrs_tpu.gguf.reader import GGUFFile

    bad_magic = tmp_path / "bad_magic.gguf"
    bad_magic.write_bytes(b"GGML" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        GGUFFile(str(bad_magic))

    empty = tmp_path / "empty.gguf"
    empty.write_bytes(b"")
    with pytest.raises((ValueError, EOFError, OSError)):
        GGUFFile(str(empty))

    truncated = tmp_path / "trunc.gguf"
    # valid magic + v3 header claiming tensors, then nothing
    import struct

    truncated.write_bytes(b"GGUF" + struct.pack("<IQQ", 3, 5, 5))
    with pytest.raises((ValueError, EOFError, OSError, struct.error)):
        GGUFFile(str(truncated))
