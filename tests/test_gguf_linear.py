"""Device quant formats vs the numpy wire-format dequant reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from mistralrs_tpu.gguf.reader import GGMLType
from mistralrs_tpu.quant import kquants
from mistralrs_tpu.quant.gguf_linear import (
    DEQUANT_WEIGHTS,
    linear_from_gguf,
)
from mistralrs_tpu.quant.qlinear import linear

rng = np.random.default_rng(0)


def _wire_blocks(gtype, out_f, in_f):
    x = rng.standard_normal((out_f, in_f)).astype(np.float32) * 0.3
    raw = kquants.quantize(x, gtype)
    return raw, x


@pytest.mark.parametrize(
    "gtype,kind",
    [
        (GGMLType.Q4_K, "gguf_q4k"),
        (GGMLType.Q5_K, "gguf_q5k"),
        (GGMLType.Q6_K, "gguf_q6k"),
        (GGMLType.Q8_0, "gguf_q8_0"),
        (GGMLType.Q4_0, "gguf_q4k"),   # legacy affine rides the Q4_K layout
        (GGMLType.Q4_1, "gguf_q4k"),
        (GGMLType.Q5_0, "gguf_q5k"),
        (GGMLType.Q5_1, "gguf_q5k"),
        (GGMLType.Q3_K, "gguf_q6k"),   # q3+28 rides the q6k s*(q-32) form
        (GGMLType.Q2_K, "gguf_q2k"),
    ],
)
def test_device_dequant_matches_wire_dequant(gtype, kind):
    out_f, in_f = 8, 512
    raw, _ = _wire_blocks(gtype, out_f, in_f)
    lin = linear_from_gguf(raw, gtype, (out_f, in_f), dtype=jnp.float32)
    assert lin.kind == kind
    want = kquants.dequantize(raw, gtype, (out_f, in_f))
    got = np.asarray(DEQUANT_WEIGHTS[kind](lin, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gtype", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
                                   GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1,
                                   GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q2_K,
                                   GGMLType.Q3_K])
def test_quant_linear_forward_matches_dense(gtype):
    out_f, in_f = 8, 512
    raw, _ = _wire_blocks(gtype, out_f, in_f)
    lin = linear_from_gguf(raw, gtype, (out_f, in_f), dtype=jnp.float32)
    w = kquants.dequantize(raw, gtype, (out_f, in_f))  # [out, in]
    x = rng.standard_normal((3, in_f)).astype(np.float32)
    got = np.asarray(linear(lin, jnp.asarray(x)))
    want = x @ w.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_unsupported_format_falls_back_to_dense():
    out_f, in_f = 4, 32
    x = rng.standard_normal((out_f, in_f)).astype(np.float32)
    raw = kquants.quantize(x, GGMLType.Q4_0)
    lin = linear_from_gguf(raw, GGMLType.Q4_0, (out_f, in_f), dtype=jnp.float32)
    assert lin.kind == "dense"
    want = kquants.dequantize(raw, GGMLType.Q4_0, (out_f, in_f))
    xq = rng.standard_normal((2, in_f)).astype(np.float32)
    got = np.asarray(linear(lin, jnp.asarray(xq)))
    np.testing.assert_allclose(got, xq @ want.T, rtol=1e-4, atol=1e-4)


# ------------------------------------------------- q6k -> rq8 requant (r5)


@pytest.mark.parametrize("gs", [32, 64])
def test_requant_q6k_to_q8_is_near_lossless(gs):
    """The int8-per-gs re-expression of Q6_K must add error well below
    Q6_K's own quantization step: max |w_rq8 - w_q6k| <= s_gs/2 where
    s_gs ~= max|w|_gs/127 (~4x below the inherent s16 step)."""
    from mistralrs_tpu.quant.gguf_linear import requant_q6k_to_q8

    out_f, in_f = 8, 512
    raw, _ = _wire_blocks(GGMLType.Q6_K, out_f, in_f)
    lin = linear_from_gguf(raw, GGMLType.Q6_K, (out_f, in_f), dtype=jnp.float32)
    w6 = np.asarray(DEQUANT_WEIGHTS["gguf_q6k"](lin, jnp.float32))  # [out, in]
    rq = requant_q6k_to_q8(lin, gs=gs)
    assert rq.kind == "gguf_q8_0" and rq.meta == gs
    w8 = np.asarray(DEQUANT_WEIGHTS["gguf_q8_0"](rq, jnp.float32))
    # per-gs bound: |err| <= scale/2 elementwise
    s = np.asarray(rq.data["scale"])  # [in/gs, out]
    bound = np.repeat(s.T, gs, axis=1) / 2 + 1e-7  # [out, in]
    assert (np.abs(w8 - w6) <= bound).all()
    # and global: rq8 error is a small fraction of q6k's own step
    s16 = np.abs(w6).max() / 31.5
    assert np.abs(w8 - w6).max() < 0.6 * s16

    # forward parity within the same bound
    x = rng.standard_normal((3, in_f)).astype(np.float32)
    y6 = np.asarray(linear(lin, jnp.asarray(x)))
    y8 = np.asarray(linear(rq, jnp.asarray(x)))
    np.testing.assert_allclose(y8, y6, atol=float(np.abs(x).max() * bound.max() * in_f ** 0.5 * 3))


def test_requant_q6k_params_engine_runs():
    """MISTRALRS_Q6K_RQ8=64 end-to-end: q6k Linears become gguf_q8_0 in the
    pipeline params (incl. stacked groups) and the engine still generates;
    tokens may legitimately differ from q6k (tiny requant noise), so assert
    structure + liveness, not token equality."""
    import os

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.config import ModelConfig
    from mistralrs_tpu.models.decoder import DecoderParams
    from mistralrs_tpu.models.loader import group_layers, make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline
    from mistralrs_tpu.quant.qlinear import Linear, make_dense

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=512, intermediate_size=512,
        num_layers=3, num_heads=8, num_kv_heads=8, head_dim=64,
        max_position_embeddings=128,
    )
    r = np.random.default_rng(9)
    H, D, I = cfg.hidden_size, cfg.head_dim, cfg.intermediate_size

    def t(*shape):
        return jnp.asarray(r.standard_normal(shape) * 0.05, jnp.float32)

    def layer(i):
        return {
            "attn": {
                "q": make_dense(t(H, cfg.num_heads * D)),
                "k": make_dense(t(H, cfg.num_kv_heads * D)),
                "v": driver_bench._random_q6k_linear(r, H, cfg.num_kv_heads * D, jnp.float32),
                "o": make_dense(t(cfg.num_heads * D, H)),
            },
            "mlp": {
                "gate": make_dense(t(H, I)),
                "up": make_dense(t(H, I)),
                "down": driver_bench._random_q6k_linear(r, I, H, jnp.float32),
            },
            "input_norm": {"w": jnp.ones((H,), jnp.float32)},
            "post_attn_norm": {"w": jnp.ones((H,), jnp.float32)},
        }

    groups, sizes = group_layers([layer(i) for i in range(3)])
    params = DecoderParams(
        embed=t(cfg.vocab_size, H), layer_groups=groups,
        final_norm={"w": jnp.ones((H,), jnp.float32)},
        lm_head=driver_bench._random_q6k_linear(r, H, cfg.vocab_size, jnp.float32),
        group_sizes=sizes)
    os.environ["MISTRALRS_Q6K_RQ8"] = "64"
    try:
        pipe = TextPipeline(
            cfg, params, make_rope(cfg),
            PipelineConfig(page_size=4, num_pages=64, max_seqs=2,
                           max_model_len=128, prefill_buckets=(8, 16),
                           dtype=jnp.float32))
    finally:
        os.environ.pop("MISTRALRS_Q6K_RQ8", None)

    def kinds(p):
        out = set()
        is_lin = lambda x: isinstance(x, Linear)  # noqa: E731
        for g in p.layer_groups:
            import jax

            for leaf in jax.tree.leaves(g, is_leaf=is_lin):
                if is_lin(leaf):
                    out.add(leaf.kind)
        return out

    assert "gguf_q6k" not in kinds(pipe.params)
    assert "gguf_q8_0" in kinds(pipe.params)
    assert pipe.params.lm_head.kind == "gguf_q8_0"
    eng = Engine(pipe, eos_token_ids=set())
    toks, _ = eng.generate([5, 6, 7, 8, 9], SamplingParams(max_len=6))
    assert len(toks) == 6 and all(0 <= t < 256 for t in toks)
