"""Super-block scan (models/superscan.py): the periodic-group collapse
must be a pure layout transform — identical serving output, fewer scans.

Tiny mixed-kind model: 9 layers whose mlp.down alternates Q4_K/Q6_K with
period 3 ([q4,q4,q6] x 3) — the same fragmentation shape as Q4_K_M's
use_more_bits pattern (17 groups for 32 layers, scripts/group_ab.py
measured ~8% end-to-end cost on chip).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.loader import group_layers, make_rope
from mistralrs_tpu.models.decoder import DecoderParams
from mistralrs_tpu.models.superscan import build_superscan, find_period
from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline
from mistralrs_tpu.quant.qlinear import make_dense


def _mixed_model(num_layers=9, dtype=jnp.float32):
    import bench as driver_bench

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=512, intermediate_size=512,
        num_layers=num_layers, num_heads=8, num_kv_heads=8, head_dim=64,
        max_position_embeddings=128,
    )
    rng = np.random.default_rng(17)
    H, D, I = cfg.hidden_size, cfg.head_dim, cfg.intermediate_size

    def t(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, dtype)

    def layer(i):
        down_q6 = i % 3 == 2
        mk4 = driver_bench._random_q4k_linear
        mk6 = driver_bench._random_q6k_linear
        return {
            "attn": {
                "q": make_dense(t(H, cfg.num_heads * D)),
                "k": make_dense(t(H, cfg.num_kv_heads * D)),
                "v": make_dense(t(H, cfg.num_kv_heads * D)),
                "o": make_dense(t(cfg.num_heads * D, H)),
            },
            "mlp": {
                "gate": make_dense(t(H, I)),
                "up": make_dense(t(H, I)),
                "down": (mk6 if down_q6 else mk4)(rng, I, H, dtype),
            },
            "input_norm": {"w": jnp.ones((H,), dtype)},
            "post_attn_norm": {"w": jnp.ones((H,), dtype)},
        }

    groups, sizes = group_layers([layer(i) for i in range(num_layers)])
    params = DecoderParams(
        embed=t(cfg.vocab_size, H), layer_groups=groups,
        final_norm={"w": jnp.ones((H,), dtype)},
        lm_head=make_dense(t(H, cfg.vocab_size)), group_sizes=sizes)
    return cfg, params


def test_find_period():
    assert find_period(list("ABABABAB")) == (0, 2, 4)
    assert find_period(list("XABABABABY")) == (1, 2, 4)
    assert find_period(list("ABAB")) is None  # < 3 reps
    assert find_period(list("ABCABCABC")) == (0, 3, 3)


def test_build_superscan_collapses_groups():
    cfg, params = _mixed_model()
    assert params.group_sizes == (2, 1, 2, 1, 2, 1)
    sp = build_superscan(params)
    assert sp.group_sizes == (9,)
    assert isinstance(sp.layer_groups[0], list)
    assert len(sp.layer_groups[0]) == 2  # [q4-pair dict, q6 dict]


def _generate(cfg, params, superscan, mesh=None, inline=False, splice=None,
              stacked=None):
    os.environ["MISTRALRS_SUPERSCAN"] = "1" if superscan else "0"
    if inline:
        os.environ["MISTRALRS_INLINE_GROUPS"] = "1"
    # stacked/splice default ON since r4 — OFF-vs-ON comparisons must pin the
    # baseline arm explicitly or both arms run the identical configuration
    if splice is not None:
        os.environ["MISTRALRS_KV_SPLICE"] = "1" if splice else "0"
    if stacked is not None:
        os.environ["MISTRALRS_STACKED_KERNELS"] = "1" if stacked else "0"
    try:
        pipe = TextPipeline(
            cfg, params, make_rope(cfg),
            PipelineConfig(page_size=4, num_pages=64, max_seqs=2,
                           max_model_len=128, prefill_buckets=(8, 16),
                           dtype=jnp.float32),
            mesh=mesh)
        if superscan:
            assert any(isinstance(g, list) for g in pipe.params.layer_groups)
        eng = Engine(pipe, eos_token_ids=set())
        prompt = np.random.default_rng(5).integers(3, 250, size=9).tolist()
        toks, _ = eng.generate(prompt, SamplingParams(max_len=8))
        return toks
    finally:
        os.environ.pop("MISTRALRS_SUPERSCAN", None)
        os.environ.pop("MISTRALRS_INLINE_GROUPS", None)
        os.environ.pop("MISTRALRS_KV_SPLICE", None)
        os.environ.pop("MISTRALRS_STACKED_KERNELS", None)


def test_superscan_engine_tokens_match():
    cfg, params = _mixed_model()
    want = _generate(cfg, params, superscan=False)
    got = _generate(cfg, params, superscan=True)
    assert got == want


def test_superscan_sharded_matches():
    from mistralrs_tpu.parallel.mesh import make_mesh

    cfg, params = _mixed_model()
    want = _generate(cfg, params, superscan=False)
    got = _generate(cfg, params, superscan=True, mesh=make_mesh(dp=2, tp=4))
    assert got == want


def test_inline_groups_engine_tokens_match():
    """MISTRALRS_INLINE_GROUPS=1 (straight-line tiny groups) is a pure
    compile-structure change — engine tokens identical."""
    cfg, params = _mixed_model()
    want = _generate(cfg, params, superscan=False)
    got = _generate(cfg, params, superscan=False, inline=True)
    assert got == want


def test_kv_splice_engine_tokens_match():
    """MISTRALRS_KV_SPLICE=1 (DUS accumulation instead of parts+concat) is
    a pure dataflow change — engine tokens identical. Baseline pins splice
    AND stacked OFF (splice follows the stacked gate, default ON since r4)."""
    cfg, params = _mixed_model()
    want = _generate(cfg, params, superscan=False, splice=False, stacked=False)
    got = _generate(cfg, params, superscan=False, splice=True)
    assert got == want


def test_stacked_kernels_engine_tokens_match():
    """MISTRALRS_STACKED_KERNELS=1: on CPU the stacked Linears resolve
    through the generic unstack fallback — the lidx plumbing end-to-end
    must be token-exact (the TPU kernels have their own interpret parity
    tests)."""
    cfg, params = _mixed_model()
    want = _generate(cfg, params, superscan=False, stacked=False,
                     splice=False)
    got = _generate(cfg, params, superscan=False, stacked=True)
    assert got == want
