"""Real-TPU-only parity tests (skipped on CPU; run on hardware with
`pytest -m tpu`). These codify the manual on-chip validations of the
TPU-gated kernel paths: flash prefill (first + continuation chunks), the
Pallas block-table decode kernel, and the fused Q4_K dequant-GEMM."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _tiny(max_pos=1024, dtype_name="float32"):
    import jax.numpy as jnp
    import torch
    import transformers as tf

    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import TensorSource, params_from_source

    torch.manual_seed(3)
    hf_cfg = tf.LlamaConfig(
        hidden_size=256, intermediate_size=512, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, vocab_size=256,
        max_position_embeddings=max_pos, head_dim=128,
    )
    model = tf.LlamaForCausalLM(hf_cfg).eval().float()
    cfg = config_from_hf(json.loads(hf_cfg.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd),
                                dtype=getattr(jnp, dtype_name))
    return cfg, params


def _generate(cfg, params, prompt, *, flash=True, max_model_len=512, buckets=(128,), dtype=None):
    import jax.numpy as jnp

    import mistralrs_tpu.models.decoder as dec
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    o1, o2, o3 = (dec._use_flash_prefill, dec._use_flash_continuation,
                  dec._use_paged_decode_kernel)
    if not flash:
        dec._use_flash_prefill = lambda c, T, m: False
        dec._use_flash_continuation = lambda c, T, m, s: False
        dec._use_paged_decode_kernel = lambda c, T, w, s=0: False
    try:
        pc = PipelineConfig(page_size=16, num_pages=128, max_seqs=2,
                            max_model_len=max_model_len, prefill_buckets=buckets,
                            dtype=dtype or jnp.float32, decode_steps=1)
        eng = Engine(TextPipeline(cfg, params, make_rope(cfg), pc),
                     eos_token_ids=set())
        toks, _ = eng.generate(list(prompt), SamplingParams(max_len=8))
        return toks
    finally:
        dec._use_flash_prefill = o1
        dec._use_flash_continuation = o2
        dec._use_paged_decode_kernel = o3


def test_flash_prefill_paths_match_gather():
    cfg, params = _tiny()
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 250, size=300).tolist()  # first + 2 continuation
    assert _generate(cfg, params, prompt, flash=True) == \
        _generate(cfg, params, prompt, flash=False)


def test_q4k_kernel_matches_reference_on_chip():
    import jax.numpy as jnp

    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.ops.quant_matmul import q4k_matmul
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.gguf_linear import _ref_forward, linear_from_gguf

    rng = np.random.default_rng(1)
    O, K = 1024, 2048
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q4_K)
    lin = linear_from_gguf(raw, GGMLType.Q4_K, (O, K), dtype=jnp.bfloat16)
    x = (rng.standard_normal((8, K)) * 0.5).astype(np.float32)
    got = np.asarray(q4k_matmul(lin, jnp.asarray(x, jnp.bfloat16)), np.float32)
    want = np.asarray(_ref_forward(lin, jnp.asarray(x, jnp.bfloat16)), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-1)


def test_ragged_dot_moe_on_chip():
    """lax.ragged_dot lowering on this toolchain + grouped MoE == dense MoE
    (gates flipping moe_grouped on for the axon backend)."""
    import dataclasses
    import json

    import jax
    import jax.numpy as jnp
    import torch
    import transformers as tf

    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.decoder import decoder_forward
    from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
    from mistralrs_tpu.ops.paged_attention import PagedAttnMeta, PagedKVCache

    torch.manual_seed(9)
    hf_cfg = tf.MixtralConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        num_local_experts=4, num_experts_per_tok=2, max_position_embeddings=128,
    )
    model = tf.MixtralForCausalLM(hf_cfg).eval().float()
    cfg = config_from_hf(json.loads(hf_cfg.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    rope = make_rope(cfg)

    B, T, page = 2, 8, 4
    ids = jnp.asarray(np.random.default_rng(1).integers(3, 120, size=(B, T)), jnp.int32)
    tables = np.arange(1, 1 + B * 3, dtype=np.int32).reshape(B, 3)
    positions = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    slots = tables[:, positions[0] // page] * page + positions % page
    meta = PagedAttnMeta(
        positions=jnp.asarray(positions), slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(tables), kv_lens=jnp.full((B,), T, jnp.int32),
        active=jnp.ones((B,), jnp.float32),
    )

    def run(grouped):
        c = dataclasses.replace(cfg, moe_grouped=grouped)
        cache = PagedKVCache.create(c.num_layers, 16, page, c.num_kv_heads,
                                    c.head_dim, jnp.float32)
        h, _ = jax.jit(
            lambda p, cc, i, m: decoder_forward(p, c, rope, i, cc, m)
        )(params, cache, ids, meta)
        return np.asarray(h)

    dense = run(False)
    grouped = run(True)
    np.testing.assert_allclose(grouped, dense, rtol=2e-4, atol=2e-4)


def test_flash_prefill_bf16_matches_f32(monkeypatch):
    """bf16-streamed flash prefill (MISTRALRS_FLASH_BF16=1) must track the
    f32-streamed path on hardware: same greedy tokens from the same bf16
    model (the two paths differ only in the kernel's streaming dtype).
    bf16 streaming is the default since round 2, so the baseline arm must
    force =0 explicitly — with the env unset both arms would stream bf16
    and the parity assertion would be vacuous."""
    import jax.numpy as jnp

    cfg, params = _tiny(dtype_name="bfloat16")
    rng = np.random.default_rng(7)
    prompt = rng.integers(3, 250, size=128).tolist()
    monkeypatch.setenv("MISTRALRS_FLASH_BF16", "0")
    base = _generate(cfg, params, prompt, flash=True, dtype=jnp.bfloat16)
    monkeypatch.setenv("MISTRALRS_FLASH_BF16", "1")
    bf16 = _generate(cfg, params, prompt, flash=True, dtype=jnp.bfloat16)
    assert sum(a == b for a, b in zip(base, bf16)) >= 7, (base, bf16)


def test_gmm_grouped_moe_on_chip(monkeypatch):
    """The Pallas megablocks grouped-GEMM backend (MISTRALRS_MOE_BACKEND=gmm)
    must lower under Mosaic on this toolchain and match lax.ragged_dot.
    Passing makes gmm a serving-eligible MoE backend; scripts/tpu_queue.sh
    times the two to pick the default (see PERF.md)."""
    import jax.numpy as jnp

    from mistralrs_tpu.ops.grouped_gemm import grouped_matmul

    rng = np.random.default_rng(13)
    G, M, K, N = 8, 256, 512, 1024
    sizes = np.zeros(G, np.int32)
    cuts = np.sort(rng.integers(0, M + 1, size=G - 1))
    sizes[:] = np.diff(np.concatenate([[0], cuts, [M]]))
    lhs = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    rhs = jnp.asarray(rng.standard_normal((G, K, N)) * 0.1, jnp.bfloat16)
    gs = jnp.asarray(sizes, jnp.int32)
    want = np.asarray(grouped_matmul(lhs, rhs, gs, backend="ragged"), np.float32)
    got = np.asarray(grouped_matmul(lhs, rhs, gs, backend="gmm"), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-1)


def test_splash_prefill_on_chip():
    """SplashAttention (LocalMask window + softcap, MQA grouping) must lower
    under Mosaic on this toolchain and match the masked dense sdpa at
    realistic dims. Passing means the MISTRALRS_SPLASH=1 path is
    serving-eligible (then flip the default in decoder._use_splash_prefill)."""
    import jax.numpy as jnp

    from mistralrs_tpu.ops import attention as attn_ops
    from mistralrs_tpu.ops.splash import splash_prefill

    rng = np.random.default_rng(17)
    B, T, Hq, Hkv, D, W = 2, 512, 8, 2, 128, 256
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    scale = D**-0.5
    for softcap in (None, 50.0):
        got = np.asarray(
            splash_prefill(q, k, v, scale=scale, sliding_window=W,
                           logits_softcap=softcap), np.float32)
        bias = attn_ops.causal_mask_bias(T, T, sliding_window=W)
        want = np.asarray(
            attn_ops.sdpa(q, k, v, scale=scale, mask=bias,
                          logits_softcap=softcap), np.float32)
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_ragged_kernel_on_chip():
    """The unified ragged-paged-attention kernel must lower on this
    toolchain and match its reference implementation on a mixed
    prefill+decode batch with window and softcap. Passing green-lights
    stage 2 of the adoption plan (ops/ragged_attention.py docstring)."""
    import jax.numpy as jnp

    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ref_ragged_paged_attention,
    )

    from mistralrs_tpu.ops.ragged_attention import (
        combine_kv, flatten_queries, ragged_attention,
    )

    rng = np.random.default_rng(23)
    Hq, Hkv, D, page, P = 8, 2, 128, 16, 128
    q_lens = [1, 128, 16, 1]
    kv_lens = [512, 128, 640, 64]
    B = len(q_lens)
    pages_per_seq = max(-(-kv // page) for kv in kv_lens)
    T = max(q_lens)
    k_hm = jnp.asarray(rng.standard_normal((Hkv, P, page, D)), jnp.bfloat16)
    v_hm = jnp.asarray(rng.standard_normal((Hkv, P, page, D)), jnp.bfloat16)
    tables = np.zeros((B, pages_per_seq), np.int32)
    nxt = 1
    for i, kv in enumerate(kv_lens):
        n = -(-kv // page)
        tables[i, :n] = np.arange(nxt, nxt + n)
        nxt += n
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.bfloat16)
    q_flat, cu = flatten_queries(q, jnp.asarray(q_lens, jnp.int32))
    q_flat = q_flat[: sum(q_lens)]
    pool = combine_kv(k_hm, v_hm)
    args = (q_flat, pool, jnp.asarray(kv_lens, jnp.int32),
            jnp.asarray(tables), cu, jnp.asarray([B], jnp.int32))
    for window, cap in [(None, None), (256, 50.0)]:
        got = np.asarray(ragged_attention(
            *args, scale=D**-0.5, sliding_window=window, logits_softcap=cap),
            np.float32)
        want = np.asarray(ref_ragged_paged_attention(
            *args, sm_scale=D**-0.5, sliding_window=window, soft_cap=cap),
            np.float32)
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-1)


def test_ragged_backend_serving_on_chip(monkeypatch):
    """MISTRALRS_ATTN_BACKEND=ragged through the ENGINE on hardware: the
    combined-pool pipeline must greedy-match the default backend end-to-end
    (decode + continuation chunks route through ragged_attention_padded).
    Passing + a ragged_ab.py win = flip the backend default."""
    import jax.numpy as jnp

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg, params = _tiny(dtype_name="bfloat16")
    rng = np.random.default_rng(11)
    prompt = rng.integers(3, 250, size=150).tolist()

    def run(backend):
        if backend:
            monkeypatch.setenv("MISTRALRS_ATTN_BACKEND", backend)
        else:
            monkeypatch.delenv("MISTRALRS_ATTN_BACKEND", raising=False)
        from mistralrs_tpu.models.loader import make_rope as mk
        pc = PipelineConfig(page_size=16, num_pages=128, max_seqs=2,
                            max_model_len=512, prefill_buckets=(128,))
        eng = Engine(TextPipeline(cfg, params, mk(cfg, 512), pc),
                     eos_token_ids=set())
        toks, _ = eng.generate(prompt, SamplingParams(max_len=12))
        return toks

    assert run("ragged") == run(None)


def test_q5k_kernel_matches_reference_on_chip():
    """Q5_K fused kernel (Q4_K nibble kernel + 1-bit plane kernel) on the
    real Mosaic toolchain — interpret-green has failed twice before
    (commits e56ec51, 8668b29), so the r2-shipped Q5_K path needs its own
    on-chip witness (VERDICT r2 next-step #5)."""
    import jax.numpy as jnp

    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.ops.quant_matmul import q5k_matmul
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.gguf_linear import _ref_forward, linear_from_gguf

    rng = np.random.default_rng(2)
    O, K = 1024, 2048
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q5_K)
    lin = linear_from_gguf(raw, GGMLType.Q5_K, (O, K), dtype=jnp.bfloat16)
    x = (rng.standard_normal((8, K)) * 0.5).astype(np.float32)
    got = np.asarray(q5k_matmul(lin, jnp.asarray(x, jnp.bfloat16)), np.float32)
    want = np.asarray(_ref_forward(lin, jnp.asarray(x, jnp.bfloat16)), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-1)


def test_q2k_affine_kernel_on_chip():
    """The generic plane-affine kernel serving GGUF Q2_K (group 16) must
    lower under the real Mosaic toolchain and match the XLA dequant path."""
    import jax.numpy as jnp

    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.ops.quant_matmul import affine_qmatmul
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.gguf_linear import _ref_forward, linear_from_gguf

    rng = np.random.default_rng(3)
    O, K = 512, 2048
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q2_K)
    lin = linear_from_gguf(raw, GGMLType.Q2_K, (O, K), dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((8, K)) * 0.5, jnp.bfloat16)
    y = affine_qmatmul(lin, x, bits=2, group=16, zs_key="minv")
    assert y is not None, "affine kernel constraints unexpectedly rejected Q2_K shape"
    want = np.asarray(_ref_forward(lin, x), np.float32)
    np.testing.assert_allclose(np.asarray(y, np.float32), want, rtol=5e-2, atol=5e-1)


def _affine_case(lin, bits_packed):
    """Run the fused affine kernel the registered forward would pick and the
    dense dequant fallback on the same Linear; return (kernel, fallback)."""
    import jax.numpy as jnp

    from mistralrs_tpu.ops.quant_matmul import affine_qmatmul

    rng = np.random.default_rng(4)
    in_f, out_f = lin.shape
    x = jnp.asarray(rng.standard_normal((8, in_f)) * 0.5, jnp.bfloat16)
    group = in_f // lin.data["scale"].shape[0]
    y = affine_qmatmul(lin, x, bits=bits_packed, group=group)
    return y, x


@pytest.mark.parametrize("bits", [2, 8])
def test_gptq_affine_kernel_on_chip(bits):
    """GPTQ 2-bit (plane-packed) and 8-bit (byte) through the fused affine
    kernel on the real toolchain, vs the XLA dequant-then-dot fallback."""
    import jax.numpy as jnp

    from mistralrs_tpu.quant.gptq import (_gptq_weights,
                                          gptq_linear_from_tensors,
                                          quantize_gptq_rtn)

    rng = np.random.default_rng(5)
    O, K = 512, 4096  # K_per >= 8*group so the affine kernel path engages
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    t = quantize_gptq_rtn(w, bits, group_size=128)
    lin = gptq_linear_from_tensors(
        t["qweight"], t["qzeros"], t["scales"].astype(np.float32), t["g_idx"],
        bits, K, O, dtype=jnp.bfloat16)
    assert lin.kind == f"gptq_{bits}", lin.kind
    y, x = _affine_case(lin, bits)
    assert y is not None, "affine kernel constraints unexpectedly rejected GPTQ shape"
    want = np.asarray(x @ _gptq_weights(lin, jnp.bfloat16, bits), np.float32)
    np.testing.assert_allclose(np.asarray(y, np.float32), want, rtol=5e-2, atol=5e-1)


def test_gptq3_byte_affine_kernel_on_chip():
    """GPTQ 3-bit stores bytes (kind gptq_b8) and rides the affine kernel
    with bits=8 — the byte path needs its own on-chip witness."""
    import jax.numpy as jnp

    from mistralrs_tpu.quant.gptq import (_gptq_weights,
                                          gptq_linear_from_tensors,
                                          quantize_gptq_rtn)

    rng = np.random.default_rng(6)
    O, K = 512, 4096
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    t = quantize_gptq_rtn(w, 3, group_size=128)
    lin = gptq_linear_from_tensors(
        t["qweight"], t["qzeros"], t["scales"].astype(np.float32), t["g_idx"],
        3, K, O, dtype=jnp.bfloat16)
    assert lin.kind == "gptq_b8", lin.kind
    y, x = _affine_case(lin, 8)
    assert y is not None
    # byte storage: dequant with bits=8 (the registered gptq_b8 forward does)
    want = np.asarray(x @ _gptq_weights(lin, jnp.bfloat16, 8), np.float32)
    np.testing.assert_allclose(np.asarray(y, np.float32), want, rtol=5e-2, atol=5e-1)


@pytest.mark.parametrize("bits", [1, 2, 8])
def test_hqq_affine_kernel_on_chip(bits):
    """HQQ 1/2-bit plane-packed and 8-bit byte layouts through the fused
    affine kernel on the real toolchain (HQQ-4 maps onto the Q4_K kernel,
    covered by test_q4k_kernel_matches_reference_on_chip)."""
    import jax.numpy as jnp

    from mistralrs_tpu.quant.hqq import hqq_dequant_weights, quantize_hqq

    rng = np.random.default_rng(7)
    O, K = 512, 4096
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    lin = quantize_hqq(w, bits, group_size=64, dtype=jnp.bfloat16)
    assert lin.kind == f"hqq_{bits}", lin.kind
    y, x = _affine_case(lin, bits if bits in (1, 2) else 8)
    assert y is not None
    want = np.asarray(x @ hqq_dequant_weights(lin, jnp.bfloat16, bits), np.float32)
    np.testing.assert_allclose(np.asarray(y, np.float32), want, rtol=5e-2, atol=5e-1)


def test_q4k_int8_path_on_chip():
    """The Q8-activation int8-MXU decode path (default on TPU since r3)
    must lower under the real Mosaic toolchain and track the dequant
    reference within the activation-quant budget."""
    import jax.numpy as jnp

    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.ops.quant_matmul import _q4k_q8_matmul_padded, q4k_matmul
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.gguf_linear import _ref_forward, linear_from_gguf

    rng = np.random.default_rng(8)
    O, K = 1024, 2048
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q4_K)
    lin = linear_from_gguf(raw, GGMLType.Q4_K, (O, K), dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((8, K)) * 0.5, jnp.bfloat16)
    got = np.asarray(_q4k_q8_matmul_padded(
        x, lin.data["qs"], lin.data["scale"], lin.data["minv"],
        block_o=1024, block_k=1024), np.float32)
    want = np.asarray(_ref_forward(lin, x), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-1)
    # and the dispatcher takes it on this backend
    via_dispatch = np.asarray(q4k_matmul(lin, x), np.float32)
    np.testing.assert_allclose(via_dispatch, got, rtol=1e-6, atol=1e-4)


def test_q6k_int8_path_on_chip():
    """MISTRALRS_Q6K_INT8 candidate: int8 Q6_K path must lower under the
    real Mosaic toolchain (128 16-deep dots per k-step) and track the
    dequant reference. Default flip additionally needs the timing A/B
    (scripts/dequant_ab3.py --q6k-int8) to clear the bf16 kernel."""
    import jax.numpy as jnp

    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.ops.quant_matmul import _q6k_q8_matmul_padded
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.gguf_linear import _ref_forward, linear_from_gguf

    rng = np.random.default_rng(9)
    O, K = 1024, 2048
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q6_K)
    lin = linear_from_gguf(raw, GGMLType.Q6_K, (O, K), dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((8, K)) * 0.5, jnp.bfloat16)
    # r4: x passes in NATURAL element order (no runtime perm gather)
    got = np.asarray(_q6k_q8_matmul_padded(
        x, lin.data["ql"], lin.data["qh"], lin.data["scale"],
        block_o=1024, G=lin.meta), np.float32)
    want = np.asarray(_ref_forward(lin, x), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-1)


def test_q8_0_int8_path_on_chip():
    """MISTRALRS_Q8_0_INT8 candidate: the already-int8 weights contract in
    per-32-sub-block int8 dots — must lower under the real Mosaic toolchain
    and track the dequant reference. Default flip additionally needs the
    timing A/B (scripts/dequant_ab3.py --q8_0-int8)."""
    import jax.numpy as jnp

    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.ops.quant_matmul import _q8_0_q8_matmul_padded
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.gguf_linear import _ref_forward, linear_from_gguf

    rng = np.random.default_rng(10)
    O, K = 1024, 2048
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q8_0)
    lin = linear_from_gguf(raw, GGMLType.Q8_0, (O, K), dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((8, K)) * 0.5, jnp.bfloat16)
    got = np.asarray(_q8_0_q8_matmul_padded(
        x, lin.data["q"], lin.data["scale"], block_o=512, block_k=1024),
        np.float32)
    want = np.asarray(_ref_forward(lin, x), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-1)


def test_q5k_int8_path_on_chip():
    """MISTRALRS_Q5K_INT8 candidate: nibble+min terms ride the Q4_K int8
    kernel; the 1-bit-plane hbit kernel (64 32-deep dots per k-step) must
    lower and track the dequant reference. Default flip additionally needs
    the timing A/B (scripts/dequant_ab3.py --q5k-int8)."""
    import jax.numpy as jnp

    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.ops.quant_matmul import _q5k_q8_matmul_padded
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.gguf_linear import _ref_forward, linear_from_gguf

    rng = np.random.default_rng(11)
    O, K = 1024, 2048
    w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
    raw = kquants.quantize(w, GGMLType.Q5_K)
    lin = linear_from_gguf(raw, GGMLType.Q5_K, (O, K), dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((8, K)) * 0.5, jnp.bfloat16)
    got = np.asarray(_q5k_q8_matmul_padded(
        x, lin.data["qs"], lin.data["qh"], lin.data["scale"],
        lin.data["minv"], block_o=1024, block_k=1024, block_k8=256),
        np.float32)
    want = np.asarray(_ref_forward(lin, x), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=6e-1)


def test_stacked_kernels_on_chip():
    """The r4 stacked-layer kernels (scalar-prefetch layer index into
    [L, ...] weight stacks — the serving default since d4669c0) must lower
    under the real Mosaic toolchain and match the per-layer padded calls
    for every layer index."""
    import jax.numpy as jnp

    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.ops.quant_matmul import (
        _q4k_q8_matmul_padded, _q4k_q8_matmul_stacked, _q6k_matmul_padded,
        _q6k_matmul_stacked, _q6k_q8_matmul_padded, _q6k_q8_matmul_stacked)
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.gguf_linear import linear_from_gguf

    rng = np.random.default_rng(12)
    O, K, L = 512, 2048, 3
    l4, l6 = [], []
    for i in range(L):
        w = (rng.standard_normal((O, K)) * 0.3).astype(np.float32)
        l4.append(linear_from_gguf(kquants.quantize(w, GGMLType.Q4_K),
                                   GGMLType.Q4_K, (O, K), dtype=jnp.bfloat16))
        l6.append(linear_from_gguf(kquants.quantize(w, GGMLType.Q6_K),
                                   GGMLType.Q6_K, (O, K), dtype=jnp.bfloat16))
    qs = jnp.stack([l.data["qs"] for l in l4])
    sc4 = jnp.stack([l.data["scale"] for l in l4])
    mv = jnp.stack([l.data["minv"] for l in l4])
    ql = jnp.stack([l.data["ql"] for l in l6])
    qh = jnp.stack([l.data["qh"] for l in l6])
    sc6 = jnp.stack([l.data["scale"] for l in l6])
    G = l6[0].meta
    x = jnp.asarray(rng.standard_normal((8, K)) * 0.5, jnp.bfloat16)
    for i in range(L):
        li = jnp.asarray([i], jnp.int32)
        want = np.asarray(_q4k_q8_matmul_padded(
            x, l4[i].data["qs"], l4[i].data["scale"], l4[i].data["minv"],
            block_o=512, block_k=1024), np.float32)
        got = np.asarray(_q4k_q8_matmul_stacked(
            li, x, qs, sc4, mv, block_o=512, block_k=1024), np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)
        want = np.asarray(_q6k_q8_matmul_padded(
            x, l6[i].data["ql"], l6[i].data["qh"], l6[i].data["scale"],
            block_o=512, G=G), np.float32)
        got = np.asarray(_q6k_q8_matmul_stacked(
            li, x, ql, qh, sc6, block_o=512, G=G), np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)
        want = np.asarray(_q6k_matmul_padded(
            x, l6[i].data["ql"], l6[i].data["qh"], l6[i].data["scale"],
            block_o=512, G=G), np.float32)
        got = np.asarray(_q6k_matmul_stacked(
            li, x, ql, qh, sc6, block_o=512, G=G), np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)
