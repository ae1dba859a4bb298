"""Projection-fusion tests (quant/fuse.py).

The full qkv fusion is exercised by every engine test (fuse_projections
defaults on); these cover the r3 partial q+k fusion for mixed-kind
checkpoints — the real Q4_K_M mix (ref: llama.cpp llama_tensor_get_type
puts attn_v in Q6_K while q/k stay Q4_K) cannot fuse all three."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def _mixed_model(num_layers=2):
    import bench as driver_bench
    from mistralrs_tpu.models.config import ModelConfig
    from mistralrs_tpu.models.decoder import DecoderParams
    from mistralrs_tpu.models.loader import group_layers

    cfg = ModelConfig(
        arch="mistral", vocab_size=256, hidden_size=512,
        intermediate_size=1024, num_layers=num_layers, num_heads=4,
        num_kv_heads=2, head_dim=128, max_position_embeddings=512,
        rope_theta=1e4,
    )
    rng = np.random.default_rng(0)
    H, D, I = cfg.hidden_size, cfg.head_dim, cfg.intermediate_size

    def layer(i):
        return {
            "attn": {
                "q": driver_bench._random_q4k_linear(rng, H, cfg.num_heads * D, jnp.float32),
                "k": driver_bench._random_q4k_linear(rng, H, cfg.num_kv_heads * D, jnp.float32),
                "v": driver_bench._random_q6k_linear(rng, H, cfg.num_kv_heads * D, jnp.float32),
                "o": driver_bench._random_q4k_linear(rng, cfg.num_heads * D, H, jnp.float32),
            },
            "mlp": {
                "gate": driver_bench._random_q4k_linear(rng, H, I, jnp.float32),
                "up": driver_bench._random_q4k_linear(rng, H, I, jnp.float32),
                "down": driver_bench._random_q4k_linear(rng, I, H, jnp.float32),
            },
            "input_norm": {"w": jnp.ones((H,), jnp.float32)},
            "post_attn_norm": {"w": jnp.ones((H,), jnp.float32)},
        }

    layers = [layer(i) for i in range(cfg.num_layers)]
    groups, sizes = group_layers(layers)
    params = DecoderParams(
        embed=jnp.asarray(rng.standard_normal((cfg.vocab_size, H)) * 0.02, jnp.float32),
        layer_groups=groups,
        final_norm={"w": jnp.ones((H,), jnp.float32)},
        lm_head=driver_bench._random_q6k_linear(rng, H, cfg.vocab_size, jnp.float32),
        group_sizes=sizes,
    )
    return cfg, params


def test_partial_qk_fusion_structure():
    from mistralrs_tpu.quant.fuse import fuse_decoder_params

    cfg, params = _mixed_model()
    fused = fuse_decoder_params(params)
    attn = fused.layer_groups[0]["attn"]
    assert "qk" in attn and "v" in attn and "q" not in attn and "k" not in attn
    assert attn["qk"].shape == (512, (4 + 2) * 128)
    mlp = fused.layer_groups[0]["mlp"]
    assert "gateup" in mlp


def test_partial_qk_fusion_engine_parity():
    """Greedy streams must match with fusion on vs off for the mixed-kind
    (Q4_K q/k + Q6_K v) layout that takes the new 'qk' decoder branch."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    def run(fuse):
        cfg, params = _mixed_model()
        pc = PipelineConfig(page_size=16, num_pages=64, max_seqs=2,
                            max_model_len=128, prefill_buckets=(16,),
                            dtype=jnp.float32, fuse_projections=fuse)
        pipe = TextPipeline(cfg, params, make_rope(cfg), pc)
        if fuse:
            assert "qk" in pipe.params.layer_groups[0]["attn"]
        eng = Engine(pipe, eos_token_ids=set())
        toks, _ = eng.generate([5, 6, 7, 8], SamplingParams(max_len=8))
        return toks

    assert run(True) == run(False)


def test_pad_linear_out_forward_equivalence():
    """lm_head out-padding (r4): padded columns decode to exact zeros for a
    packed kind, the sliced forward matches the unpadded forward, and tiny
    out sizes (where padding would balloon the tensor) are refused."""
    import numpy as np

    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.fuse import pad_linear_out
    from mistralrs_tpu.quant.gguf_linear import linear_from_gguf
    from mistralrs_tpu.quant.qlinear import linear

    rng = np.random.default_rng(12)
    O, K = 1920, 256  # pad -> 2048 (128 dead cols, < O//8)
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q6_K)
    lin = linear_from_gguf(raw, GGMLType.Q6_K, (O, K), dtype=jnp.float32)
    padded = pad_linear_out(lin)
    assert padded is not None and padded.shape == (K, 2048)
    x = jnp.asarray(rng.standard_normal((3, K)).astype(np.float32))
    y_ref = np.asarray(linear(lin, x))
    y_pad = np.asarray(linear(padded, x))
    np.testing.assert_allclose(y_pad[:, :O], y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(y_pad[:, O:], 0.0)
    # tiny vocab: padding refused (would multiply the tensor)
    small = linear_from_gguf(
        kquants.quantize(w[:512], GGMLType.Q6_K), GGMLType.Q6_K, (512, K),
        dtype=jnp.float32)
    assert pad_linear_out(small) is None


def test_compute_logits_slices_padded_vocab():
    import dataclasses

    import numpy as np

    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.models.config import ModelConfig
    from mistralrs_tpu.models.decoder import DecoderParams, compute_logits
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.fuse import pad_linear_out
    from mistralrs_tpu.quant.gguf_linear import linear_from_gguf

    rng = np.random.default_rng(13)
    V, H = 1920, 256
    w = (rng.standard_normal((V, H)) * 0.3).astype(np.float32)
    lin = linear_from_gguf(kquants.quantize(w, GGMLType.Q6_K),
                           GGMLType.Q6_K, (V, H), dtype=jnp.float32)
    cfg = ModelConfig(arch="llama", vocab_size=V, hidden_size=H,
                      intermediate_size=64, num_layers=1, num_heads=4,
                      num_kv_heads=4, head_dim=64,
                      max_position_embeddings=64)
    mk = lambda head: DecoderParams(
        embed=jnp.zeros((V, H), jnp.float32), layer_groups=[],
        final_norm={"w": jnp.ones((H,), jnp.float32)}, lm_head=head,
        group_sizes=())
    h = jnp.asarray(rng.standard_normal((2, H)).astype(np.float32))
    ref = np.asarray(compute_logits(mk(lin), cfg, h))
    got = np.asarray(compute_logits(mk(pad_linear_out(lin)), cfg, h))
    assert got.shape == (2, V)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
