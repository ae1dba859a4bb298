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


# ------------------------------------------------- generic affine kernel
def test_affine_kernel_q2k():
    from mistralrs_tpu.ops.quant_matmul import affine_qmatmul

    O, K = 256, 512
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q2_K)
    lin = linear_from_gguf(raw, GGMLType.Q2_K, (O, K), dtype=jnp.float32)
    assert lin.kind == "gguf_q2k"
    wd = kquants.dequantize(raw, GGMLType.Q2_K, (O, K))
    x = (rng.standard_normal((8, K)) * 0.5).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = affine_qmatmul(lin, jnp.asarray(x), bits=2, group=16, zs_key="minv")
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), x @ wd.T, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("bits,in_f,pb", [(2, 2048, 2), (8, 1024, None)])
def test_affine_kernel_gptq(bits, in_f, pb):
    """Shapes satisfy the kernel's sublane-alignment constraints
    (K_per % (8*group) == 0 — smaller shapes now fall back to dequant:
    Mosaic rejects unaligned scale-row slices on the real toolchain).
    GPTQ-4 contiguous-group checkpoints map onto the Q4_K kernel instead
    (covered by its own tests)."""
    from mistralrs_tpu.ops.quant_matmul import affine_qmatmul
    from mistralrs_tpu.quant.gptq import (
        _gptq_weights, gptq_linear_from_tensors, quantize_gptq_rtn,
    )

    O = 256
    w = (rng.standard_normal((O, in_f)) * 0.3).astype(np.float32)
    t = quantize_gptq_rtn(w, bits, group_size=64)
    lin = gptq_linear_from_tensors(
        t["qweight"], t["qzeros"], t["scales"].astype(np.float32), t["g_idx"],
        bits, in_f, O, dtype=jnp.float32,
    )
    assert lin.kind == f"gptq_{bits}"
    want_w = np.asarray(_gptq_weights(lin, jnp.float32, bits))  # [in, out]
    x = (rng.standard_normal((3, in_f)) * 0.5).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = affine_qmatmul(lin, jnp.asarray(x), bits=pb or 8, group=64)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), x @ want_w, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("hbits,in_f", [(1, 4096), (2, 2048), (3, 512), (8, 512)])
def test_affine_kernel_hqq(hbits, in_f):
    from mistralrs_tpu.ops.quant_matmul import affine_qmatmul
    from mistralrs_tpu.quant.hqq import hqq_dequant_weights, quantize_hqq

    O = 256
    w = (rng.standard_normal((O, in_f)) * 0.3).astype(np.float32)
    lin = quantize_hqq(w, hbits, group_size=64, dtype=jnp.float32)
    if lin.kind == "gguf_q4k":
        pytest.skip("rides the q4k kernel")
    want_w = np.asarray(hqq_dequant_weights(lin, jnp.float32, hbits))
    x = (rng.standard_normal((3, in_f)) * 0.5).astype(np.float32)
    pb = None if hbits in (8, 3) else hbits
    with pltpu.force_tpu_interpret_mode():
        got = affine_qmatmul(lin, jnp.asarray(x), bits=pb or 8, group=64)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), x @ want_w, rtol=2e-2, atol=2e-2)


def test_q5k_kernel_aligned_shape():
    """K=2048 (K8 % 256 == 0) so the Q5_K hbit kernel path engages — the
    parametrized K=512 case falls back to _ref_forward under the kernel's
    sublane-alignment constraints (Mosaic rejects unaligned scale-row
    slices on the real toolchain; see r3 kernel_sweep failures)."""
    O, K = 256, 2048
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q5_K)
    lin = linear_from_gguf(raw, GGMLType.Q5_K, (O, K), dtype=jnp.float32)
    wd = kquants.dequantize(raw, GGMLType.Q5_K, (O, K))
    x = (rng.standard_normal((8, K)) * 0.5).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(q5k_matmul(lin, jnp.asarray(x)))
    np.testing.assert_allclose(got, x @ wd.T, rtol=2e-2, atol=2e-2)


def test_q4k_int8_path_matches_dequant():
    """The Q8-activation int8-MXU decode path (r3, scripts/dequant_ab3.py
    winner at 2.3x) must match the dequant reference within the activation
    quantization budget (per-32-block int8: |err_x| <= max|x_block|/254)."""
    from mistralrs_tpu.ops.quant_matmul import _q4k_q8_matmul_padded

    O, K = 256, 512
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q4_K)
    lin = linear_from_gguf(raw, GGMLType.Q4_K, (O, K), dtype=jnp.float32)
    wd = kquants.dequantize(raw, GGMLType.Q4_K, (O, K))
    x = (rng.standard_normal((8, K)) * 0.5).astype(np.float32)
    want = x @ wd.T
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_q4k_q8_matmul_padded(
            jnp.asarray(x), lin.data["qs"], lin.data["scale"],
            lin.data["minv"], block_o=256, block_k=512,
            out_dtype=jnp.float32))
    # activation-quant tolerance: per-output error accumulates as a random
    # walk of |w_k| * max|x_block|/254 terms — observed max ~0.12 at these
    # shapes (outputs are O(5), so 0.2 abs ~ 2-4% relative)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=2e-1)


def test_q6k_int8_path_matches_dequant():
    """MISTRALRS_Q6K_INT8 candidate path: Q8-activation int8 dots for the
    chunked Q6_K layout, within the activation-quant budget. K=2048 so the
    natural-order contract holds (K % 1024 == 0 => G = 512; x passes in
    natural element order — no runtime perm gather since r4)."""
    from mistralrs_tpu.ops.quant_matmul import _q6k_q8_matmul_padded

    O, K = 256, 2048
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q6_K)
    lin = linear_from_gguf(raw, GGMLType.Q6_K, (O, K), dtype=jnp.float32)
    wd = kquants.dequantize(raw, GGMLType.Q6_K, (O, K))
    x = (rng.standard_normal((8, K)) * 0.5).astype(np.float32)
    want = x @ wd.T
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_q6k_q8_matmul_padded(
            jnp.asarray(x), lin.data["ql"], lin.data["qh"], lin.data["scale"],
            block_o=256, G=lin.meta, out_dtype=jnp.float32))
    # atol scales with sqrt(K): the per-output error is a random walk of
    # |w_k| * max|x_block|/254 terms (K=2048 here vs 512 in the q4k test)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=4e-1)


def test_q6k_natural_order_kernel_matches_dequant():
    """The r4 natural-order bf16 Q6_K kernel (full [B, K] x resident,
    per-span slices at j*(K/4) + c*G, fused -32 offset epilogue) vs the
    wire-format dequant reference, via the dispatcher at K % 1024 == 0
    with multiple chunks (C = 2 exercises the dynamic c*G slicing)."""
    O, K = 256, 4096
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q6_K)
    lin = linear_from_gguf(raw, GGMLType.Q6_K, (O, K), dtype=jnp.float32)
    assert lin.meta == 512 and K // (4 * lin.meta) == 2
    wd = kquants.dequantize(raw, GGMLType.Q6_K, (O, K))
    x = (rng.standard_normal((4, K)) * 0.5).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(q6k_matmul(lin, jnp.asarray(x)))
    np.testing.assert_allclose(got, x @ wd.T, rtol=2e-2, atol=2e-2)


def test_q8_0_int8_path_matches_dequant():
    """MISTRALRS_Q8_0_INT8 candidate: the weights are already int8, so the
    int8-MXU path has zero unpack work; parity within the activation-quant
    budget (per-32-block int8: |err_x| <= max|x_block|/254)."""
    from mistralrs_tpu.ops.quant_matmul import _q8_0_q8_matmul_padded

    O, K = 256, 512
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q8_0)
    lin = linear_from_gguf(raw, GGMLType.Q8_0, (O, K), dtype=jnp.float32)
    wd = kquants.dequantize(raw, GGMLType.Q8_0, (O, K))
    x = (rng.standard_normal((8, K)) * 0.5).astype(np.float32)
    want = x @ wd.T
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_q8_0_q8_matmul_padded(
            jnp.asarray(x), lin.data["q"], lin.data["scale"],
            block_o=256, block_k=512, out_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=2e-1)


def test_q5k_int8_path_matches_dequant():
    """MISTRALRS_Q5K_INT8 candidate: nibble+min terms ride the Q4_K int8
    path; the high-bit term is the int8 1-bit-plane kernel. K=2048 so the
    hbit alignment contract (K8 % 256) holds."""
    from mistralrs_tpu.ops.quant_matmul import _q5k_q8_matmul_padded

    O, K = 256, 2048
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q5_K)
    lin = linear_from_gguf(raw, GGMLType.Q5_K, (O, K), dtype=jnp.float32)
    wd = kquants.dequantize(raw, GGMLType.Q5_K, (O, K))
    x = (rng.standard_normal((8, K)) * 0.5).astype(np.float32)
    want = x @ wd.T
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_q5k_q8_matmul_padded(
            jnp.asarray(x), lin.data["qs"], lin.data["qh"], lin.data["scale"],
            lin.data["minv"], block_o=256, block_k=512, block_k8=256,
            out_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-1)


def test_q4k_int8_stacked_matches_padded():
    """Stacked-layer kernel (scalar-prefetch layer index into [L, ...]
    arrays — the r4 fix for the per-layer weight-copy gap) must match the
    per-layer padded call for every layer index."""
    from mistralrs_tpu.ops.quant_matmul import (
        _q4k_q8_matmul_padded, _q4k_q8_matmul_stacked)

    O, K, L = 256, 512, 3
    lins = []
    for i in range(L):
        w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
        raw = kquants.quantize(w, GGMLType.Q4_K)
        lins.append(linear_from_gguf(raw, GGMLType.Q4_K, (O, K), dtype=jnp.float32))
    qs = jnp.stack([l.data["qs"] for l in lins])
    sc = jnp.stack([l.data["scale"] for l in lins])
    mv = jnp.stack([l.data["minv"] for l in lins])
    x = jnp.asarray((rng.standard_normal((8, K)) * 0.5).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        for i in range(L):
            want = np.asarray(_q4k_q8_matmul_padded(
                x, lins[i].data["qs"], lins[i].data["scale"],
                lins[i].data["minv"], block_o=256, block_k=512,
                out_dtype=jnp.float32))
            got = np.asarray(_q4k_q8_matmul_stacked(
                jnp.asarray([i], jnp.int32), x, qs, sc, mv,
                block_o=256, block_k=512, out_dtype=jnp.float32))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_q6k_stacked_matches_padded():
    from mistralrs_tpu.ops.quant_matmul import (
        _q6k_matmul_padded, _q6k_matmul_stacked, _q6k_q8_matmul_padded,
        _q6k_q8_matmul_stacked)

    O, K, L = 256, 2048, 2
    lins = []
    for i in range(L):
        w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
        raw = kquants.quantize(w, GGMLType.Q6_K)
        lins.append(linear_from_gguf(raw, GGMLType.Q6_K, (O, K), dtype=jnp.float32))
    G = lins[0].meta
    ql = jnp.stack([l.data["ql"] for l in lins])
    qh = jnp.stack([l.data["qh"] for l in lins])
    sc = jnp.stack([l.data["scale"] for l in lins])
    x = jnp.asarray((rng.standard_normal((8, K)) * 0.5).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        for i in range(L):
            want_i8 = np.asarray(_q6k_q8_matmul_padded(
                x, lins[i].data["ql"], lins[i].data["qh"],
                lins[i].data["scale"], block_o=256, G=G,
                out_dtype=jnp.float32))
            got_i8 = np.asarray(_q6k_q8_matmul_stacked(
                jnp.asarray([i], jnp.int32), x, ql, qh, sc,
                block_o=256, G=G, out_dtype=jnp.float32))
            np.testing.assert_allclose(got_i8, want_i8, rtol=1e-5, atol=1e-5)
            want_bf = np.asarray(_q6k_matmul_padded(
                x, lins[i].data["ql"], lins[i].data["qh"],
                lins[i].data["scale"], block_o=256, G=G))
            got_bf = np.asarray(_q6k_matmul_stacked(
                jnp.asarray([i], jnp.int32), x, ql, qh, sc,
                block_o=256, G=G))
            np.testing.assert_allclose(got_bf, want_bf, rtol=1e-5, atol=1e-5)
