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
