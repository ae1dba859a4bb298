"""Numerics tests for core ops vs independent torch/numpy formulations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mistralrs_tpu.ops import attention as attn_ops
from mistralrs_tpu.ops import layers as L
from mistralrs_tpu.ops import rope as rope_ops


def test_rms_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 16), dtype=np.float32)
    w = rng.standard_normal((16,), dtype=np.float32)
    got = L.rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5)
    t = torch.nn.functional.rms_norm(torch.from_numpy(x), (16,), torch.from_numpy(w), eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), t.numpy(), rtol=1e-5, atol=1e-5)


def test_rms_norm_gemma_offset():
    x = jnp.ones((2, 8))
    w = jnp.zeros((8,))  # gemma stores weights zero-centered
    out = L.rms_norm(x, w, eps=1e-6, offset=1.0)
    np.testing.assert_allclose(np.asarray(out), np.ones((2, 8)), rtol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 32), dtype=np.float32)
    w = rng.standard_normal((32,), dtype=np.float32)
    b = rng.standard_normal((32,), dtype=np.float32)
    got = L.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5)
    t = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b), eps=1e-5
    )
    np.testing.assert_allclose(np.asarray(got), t.numpy(), rtol=1e-5, atol=1e-5)


def _hf_rope_ref(x: np.ndarray, positions: np.ndarray, theta: float, rot_dim: int):
    """Independent rotate-half rope (HF transformers formulation)."""
    inv_freq = 1.0 / theta ** (np.arange(0, rot_dim, 2) / rot_dim)
    freqs = positions[:, None] * inv_freq[None]  # [T, rot/2]
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos, sin = np.cos(emb), np.sin(emb)  # [T, rot]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    half = rot_dim // 2
    rh = np.concatenate([-x_rot[..., half:], x_rot[..., :half]], axis=-1)
    out = x_rot * cos[:, None] + rh * sin[:, None]
    return np.concatenate([out, x_pass], axis=-1)


@pytest.mark.parametrize("partial", [1.0, 0.5])
def test_rope_matches_hf(partial):
    rng = np.random.default_rng(2)
    T, H, D = 5, 3, 16
    x = rng.standard_normal((1, T, H, D), dtype=np.float32)
    positions = np.array([3, 4, 5, 6, 7])
    table = rope_ops.compute_rope_table(D, 64, theta=10000.0, partial_rotary_factor=partial)
    cos, sin = table.gather(jnp.asarray(positions)[None])
    got = rope_ops.apply_rope(jnp.asarray(x), cos, sin, table.rot_dim)
    want = _hf_rope_ref(x[0], positions.astype(np.float64), 10000.0, table.rot_dim)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-4, atol=1e-4)


def test_rope_llama3_scaling_shapes():
    scaling = {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 8192,
    }
    t = rope_ops.compute_rope_table(128, 256, theta=500000.0, rope_scaling=scaling)
    assert t.cos.shape == (256, 64)
    # long wavelengths are scaled down: angle at pos p for lowest freq is smaller
    base = rope_ops.compute_rope_table(128, 256, theta=500000.0)
    assert float(t.sin[200, -1]) < float(base.sin[200, -1]) + 1e-9


def test_rope_longrope_su():
    scaling = {
        "rope_type": "su",
        "short_factor": [1.0] * 32,
        "long_factor": [2.0] * 32,
    }
    t = rope_ops.compute_rope_table(
        64, 8192, theta=10000.0, rope_scaling=scaling, original_max_position_embeddings=4096
    )
    assert t.cos.shape == (8192, 32)
    # attention mscale applied: cos(0) scaled by sqrt(1 + log(2)/log(4096))
    import math

    mscale = math.sqrt(1 + math.log(8192 / 4096) / math.log(4096))
    np.testing.assert_allclose(float(t.cos[0, 0]), mscale, rtol=1e-6)


def _torch_sdpa(q, k, v, scale, is_causal=True):
    # torch expects [B, H, T, D]; repeat KV for GQA
    Hq, Hkv = q.shape[2], k.shape[2]
    qt = torch.from_numpy(q).permute(0, 2, 1, 3)
    kt = torch.from_numpy(k).permute(0, 2, 1, 3).repeat_interleave(Hq // Hkv, dim=1)
    vt = torch.from_numpy(v).permute(0, 2, 1, 3).repeat_interleave(Hq // Hkv, dim=1)
    out = torch.nn.functional.scaled_dot_product_attention(
        qt, kt, vt, scale=scale, is_causal=is_causal
    )
    return out.permute(0, 2, 1, 3).numpy()


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_causal_gqa_attention_matches_torch(hq, hkv):
    rng = np.random.default_rng(3)
    B, T, D = 2, 6, 8
    q = rng.standard_normal((B, T, hq, D), dtype=np.float32)
    k = rng.standard_normal((B, T, hkv, D), dtype=np.float32)
    v = rng.standard_normal((B, T, hkv, D), dtype=np.float32)
    scale = D**-0.5
    got = attn_ops.gqa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale)
    want = _torch_sdpa(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_decode_attention_with_offsets_and_padding():
    """Single-token decode against full-prefill last position."""
    rng = np.random.default_rng(4)
    B, S, H, D = 1, 8, 2, 4
    ctx_len = 5
    k = rng.standard_normal((B, S, H, D), dtype=np.float32)
    v = rng.standard_normal((B, S, H, D), dtype=np.float32)
    q = rng.standard_normal((B, 1, H, D), dtype=np.float32)
    scale = D**-0.5
    got = attn_ops.gqa_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        scale=scale,
        q_offsets=jnp.array([ctx_len - 1]),
        kv_lens=jnp.array([ctx_len]),
    )
    # reference: dense attention over the first ctx_len positions only
    want = attn_ops.sdpa(
        jnp.asarray(q), jnp.asarray(k[:, :ctx_len]), jnp.asarray(v[:, :ctx_len]), scale=scale
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_sliding_window_masks_old_positions():
    rng = np.random.default_rng(5)
    B, T, H, D = 1, 8, 1, 4
    q = rng.standard_normal((B, T, H, D), dtype=np.float32)
    k = rng.standard_normal((B, T, H, D), dtype=np.float32)
    v = rng.standard_normal((B, T, H, D), dtype=np.float32)
    win = 3
    got = attn_ops.gqa_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=0.5, sliding_window=win
    )
    # last query should only see last `win` kv positions
    want_last = attn_ops.sdpa(
        jnp.asarray(q[:, -1:]),
        jnp.asarray(k[:, T - win :]),
        jnp.asarray(v[:, T - win :]),
        scale=0.5,
    )
    np.testing.assert_allclose(np.asarray(got)[:, -1:], np.asarray(want_last), rtol=1e-5, atol=1e-5)


def test_softcap_changes_scores():
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((1, 2, 1, 4)) * 4, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 1, 4)) * 4, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 1, 4)), jnp.float32)
    a = attn_ops.gqa_attention(q, k, v, scale=1.0)
    b = attn_ops.gqa_attention(q, k, v, scale=1.0, logits_softcap=5.0)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_block_attend_flash_combine_equals_dense():
    """The shared running-softmax building blocks (ops/attention.block_attend
    + flash_combine + finalize_flash) reproduce dense masked attention when
    folding over arbitrary KV blocks — including fully-masked blocks."""
    import jax.numpy as jnp
    import numpy as np

    from mistralrs_tpu.ops.attention import (
        NEG_INF, block_attend, finalize_flash, flash_combine,
    )

    rng = np.random.default_rng(5)
    B, T, Hkv, G, D, S = 2, 4, 2, 3, 8, 24
    q = rng.standard_normal((B, T, Hkv * G, D)).astype(np.float32)
    k = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    keep = rng.random((B, T, S)) < 0.6
    keep[:, :, 8:16] = False  # one block fully masked
    keep[:, :, 0] = True  # no fully-masked rows (dense ref would NaN)
    scale = D**-0.5
    qg = jnp.asarray(q * scale).reshape(B, T, Hkv, G, D)

    m = jnp.full((B, Hkv, G, T), NEG_INF, jnp.float32)
    l = jnp.zeros((B, Hkv, G, T), jnp.float32)
    acc = jnp.zeros((B, T, Hkv, G, D), jnp.float32)
    for s0 in range(0, S, 8):
        stats = block_attend(qg, jnp.asarray(k[:, s0:s0 + 8]),
                             jnp.asarray(v[:, s0:s0 + 8]),
                             jnp.asarray(keep[:, :, s0:s0 + 8]))
        m, l, acc = flash_combine(m, l, acc, *stats)
    got = np.asarray(finalize_flash(l, acc))  # [B, T, Hq, D]

    # dense reference
    qr = (q * scale).reshape(B, T, Hkv, G, D)
    s = np.einsum("bthgd,bshd->bhgts", qr, k)
    s = np.where(keep[:, None, None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bhgts,bshd->bthgd", p, v).reshape(B, T, Hkv * G, D)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # softcap variant
    m = jnp.full((B, Hkv, G, T), NEG_INF, jnp.float32)
    l = jnp.zeros((B, Hkv, G, T), jnp.float32)
    acc = jnp.zeros((B, T, Hkv, G, D), jnp.float32)
    for s0 in range(0, S, 8):
        stats = block_attend(qg, jnp.asarray(k[:, s0:s0 + 8]),
                             jnp.asarray(v[:, s0:s0 + 8]),
                             jnp.asarray(keep[:, :, s0:s0 + 8]),
                             logits_softcap=5.0)
        m, l, acc = flash_combine(m, l, acc, *stats)
    got = np.asarray(finalize_flash(l, acc))
    sc = np.tanh(np.einsum("bthgd,bshd->bhgts", qr, k) / 5.0) * 5.0
    sc = np.where(keep[:, None, None], sc, -1e30)
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bhgts,bshd->bthgd", p, v).reshape(B, T, Hkv * G, D)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grouped_matmul_gmm_matches_ragged():
    """The Pallas megablocks backend (interpret mode on CPU) must match
    lax.ragged_dot for arbitrary group splits, including empty groups and
    row counts that are not a multiple of the 128-row m-tile."""
    from mistralrs_tpu.ops.grouped_gemm import grouped_matmul

    rng = np.random.default_rng(11)
    G, K, N = 4, 96, 160
    for M, sizes in [(50, [10, 0, 25, 15]), (128, [32, 32, 32, 32]),
                     (131, [0, 131, 0, 0])]:
        lhs = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        rhs = jnp.asarray(rng.standard_normal((G, K, N)) * 0.1, jnp.float32)
        gs = jnp.asarray(sizes, jnp.int32)
        want = np.asarray(grouped_matmul(lhs, rhs, gs, backend="ragged"))
        got = np.asarray(grouped_matmul(lhs, rhs, gs, backend="gmm"))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_grouped_moe_gmm_backend_matches_dense(monkeypatch):
    """MISTRALRS_MOE_BACKEND=gmm end-to-end through the grouped MoE MLP:
    same outputs as the ragged backend (which is dense-parity tested in
    test_tpu_paths.py::test_ragged_dot_moe_on_chip)."""
    from mistralrs_tpu.models.decoder import _moe_mlp_grouped
    from mistralrs_tpu.models.config import ModelConfig
    from mistralrs_tpu.quant.qlinear import Linear

    rng = np.random.default_rng(5)
    H, I, E, Kx = 64, 96, 4, 2
    cfg = ModelConfig(
        arch="mixtral", vocab_size=64, hidden_size=H, intermediate_size=I,
        num_layers=1, num_heads=4, num_kv_heads=2, head_dim=16, num_experts=E,
        num_experts_per_tok=Kx,
    )

    def dense_lin(shape, scale=0.1):
        w = jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)
        return Linear(kind="dense", shape=(shape[-2], shape[-1]),
                      data={"w": w}, meta={})

    p = {
        "router": dense_lin((H, E)),
        "experts": {
            "gate": dense_lin((E, H, I)),
            "up": dense_lin((E, H, I)),
            "down": dense_lin((E, I, H)),
        },
    }
    x = jnp.asarray(rng.standard_normal((2, 9, H)) * 0.3, jnp.float32)
    monkeypatch.setenv("MISTRALRS_MOE_BACKEND", "ragged")
    want = np.asarray(_moe_mlp_grouped(cfg, p, x))
    monkeypatch.setenv("MISTRALRS_MOE_BACKEND", "gmm")
    got = np.asarray(_moe_mlp_grouped(cfg, p, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_mlp_row_split_matches_unsplit(monkeypatch):
    """The row-split MLP (decoder._mlp_split_rows; dequant-once prefill
    enabler) is a pure scheduling change — outputs must match bitwise-close
    with the same weights."""
    import jax.numpy as jnp
    import numpy as np

    from mistralrs_tpu.models.config import ModelConfig
    from mistralrs_tpu.models.decoder import _mlp
    from mistralrs_tpu.quant.qlinear import make_dense

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=32,
                      intermediate_size=64, num_layers=1, num_heads=4,
                      num_kv_heads=4, head_dim=8,
                      max_position_embeddings=64)
    rng = np.random.default_rng(0)
    p = {
        "gate": make_dense(jnp.asarray(rng.standard_normal((32, 64)) * 0.1,
                                       jnp.float32)),
        "up": make_dense(jnp.asarray(rng.standard_normal((32, 64)) * 0.1,
                                     jnp.float32)),
        "down": make_dense(jnp.asarray(rng.standard_normal((64, 32)) * 0.1,
                                       jnp.float32)),
    }
    x = jnp.asarray(rng.standard_normal((2, 48, 32)) * 0.5, jnp.float32)
    monkeypatch.setenv("MISTRALRS_MLP_SPLIT_ROWS", "0")
    want = np.asarray(_mlp(cfg, p, x))
    monkeypatch.setenv("MISTRALRS_MLP_SPLIT_ROWS", "40")  # 96 rows -> 3 slices
    got = np.asarray(_mlp(cfg, p, x))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
