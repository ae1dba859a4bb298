"""Pallas dequant-GEMM kernels vs numpy wire-format reference.

On CPU these run under the Pallas TPU interpreter (bit-exact semantics,
slow); the real-TPU path is exercised by bench.py and the tpu marker.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mistralrs_tpu.gguf.reader import GGMLType
from mistralrs_tpu.ops.quant_matmul import q4k_matmul, q5k_matmul, q6k_matmul, q8_0_matmul
from mistralrs_tpu.quant import kquants
from mistralrs_tpu.quant.gguf_linear import linear_from_gguf

rng = np.random.default_rng(0)


@pytest.mark.parametrize(
    "gtype,fn",
    [(GGMLType.Q4_K, q4k_matmul), (GGMLType.Q5_K, q5k_matmul),
     (GGMLType.Q6_K, q6k_matmul), (GGMLType.Q8_0, q8_0_matmul)],
)
@pytest.mark.parametrize("B", [1, 8])
def test_kernel_matches_reference(gtype, fn, B):
    O, K = 256, 512
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, gtype)
    lin = linear_from_gguf(raw, gtype, (O, K), dtype=jnp.float32)
    wd = kquants.dequantize(raw, gtype, (O, K))
    x = (rng.standard_normal((B, K)) * 0.5).astype(np.float32)
    want = x @ wd.T
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fn(lin, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_kernel_bias_and_3d_input():
    O, K = 256, 512
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    b = rng.standard_normal(O).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q8_0)
    lin = linear_from_gguf(raw, GGMLType.Q8_0, (O, K), dtype=jnp.float32)
    lin.data["b"] = jnp.asarray(b)
    wd = kquants.dequantize(raw, GGMLType.Q8_0, (O, K))
    x = (rng.standard_normal((2, 3, K)) * 0.5).astype(np.float32)
    want = x @ wd.T + b
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(q8_0_matmul(lin, jnp.asarray(x)))
    assert got.shape == (2, 3, O)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
