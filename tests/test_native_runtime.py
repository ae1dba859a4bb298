"""Native C++ block allocator: behavioral equivalence with the Python
reference under randomized op sequences, plus engine e2e on the native path."""

import numpy as np
import pytest

from mistralrs_tpu.engine.block_manager import (
    AllocStatus,
    BlockManager,
    NativeBlockManager,
)
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.engine.sequence import Sequence
from mistralrs_tpu.native import runtime_lib


@pytest.fixture(scope="module")
def lib():
    lib = runtime_lib()
    if lib is None:
        pytest.skip("native runtime unavailable")
    return lib


def _mk_seq(tokens):
    return Sequence(list(tokens), SamplingParams())


def test_native_fuzz_equivalence(lib):
    rng = np.random.default_rng(0)
    py = BlockManager(64, 4)
    nat = NativeBlockManager(lib, 64, 4)
    seqs_py: dict[int, Sequence] = {}
    seqs_nat: dict[int, Sequence] = {}
    next_id = [0]

    def new_pair(ntok):
        s1, s2 = _mk_seq(range(ntok)), _mk_seq(range(ntok))
        i = next_id[0]
        next_id[0] += 1
        seqs_py[i] = s1
        seqs_nat[i] = s2
        return s1, s2

    for step in range(600):
        op = rng.integers(0, 5)
        if op == 0 or not seqs_py:  # new seq + allocate
            n = int(rng.integers(1, 30))
            s1, s2 = new_pair(n)
            a1, a2 = py.can_allocate(s1), nat.can_allocate(s2)
            assert a1 == a2, (step, a1, a2)
            if a1 == AllocStatus.OK:
                py.allocate(s1)
                nat.allocate(s2)
                s1.kv_len = s2.kv_len = n
                assert s1.block_table == s2.block_table, step
            else:
                last = max(seqs_py)
                seqs_py.pop(last)
                seqs_nat.pop(last)
        elif op == 1:  # append
            key = list(seqs_py)[int(rng.integers(0, len(seqs_py)))]
            s1, s2 = seqs_py[key], seqs_nat[key]
            if not s1.block_table:
                continue
            n = int(rng.integers(1, 5))
            c1, c2 = py.can_append_token(s1, n), nat.can_append_token(s2, n)
            assert c1 == c2, step
            if c1:
                r1, r2 = py.append_slot(s1, n), nat.append_slot(s2, n)
                assert r1 == r2, (step, r1, r2)
                assert s1.block_table == s2.block_table, step
                s1.kv_len += n
                s2.kv_len += n
        elif op == 2:  # free
            key = list(seqs_py)[int(rng.integers(0, len(seqs_py)))]
            py.free_sequence(seqs_py.pop(key))
            nat.free_sequence(seqs_nat.pop(key))
        elif op == 3 and seqs_py:  # share a prefix of an allocated seq
            key = list(seqs_py)[int(rng.integers(0, len(seqs_py)))]
            src1, src2 = seqs_py[key], seqs_nat[key]
            k = len(src1.block_table) // 2
            if k == 0:
                continue
            s1, s2 = new_pair(k * 4 + 2)
            py.share_prefix(s1, src1.block_table[:k])
            nat.share_prefix(s2, src2.block_table[:k])
            s1.kv_len = s2.kv_len = k * 4
            assert s1.block_table == s2.block_table, step
        elif op == 4 and seqs_py:  # ref/unref a page set (prefix-cache style)
            key = list(seqs_py)[int(rng.integers(0, len(seqs_py)))]
            pages = seqs_py[key].block_table[:2]
            py.ref_pages(pages)
            nat.ref_pages(pages)
            py.unref_pages(pages)
            nat.unref_pages(pages)
        assert py.num_free == nat.num_free, step
    # drain everything: pools must return to full
    for key in list(seqs_py):
        py.free_sequence(seqs_py.pop(key))
        nat.free_sequence(seqs_nat.pop(key))
    assert py.num_free == nat.num_free == 63


def test_native_engine_end_to_end(lib):
    """Engine on the native allocator decodes identically to the Python one."""
    import json

    import jax.numpy as jnp
    import torch
    import transformers as tf

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    torch.manual_seed(3)
    hf_cfg = tf.LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=128,
    )
    model = tf.LlamaForCausalLM(hf_cfg).eval().float()
    cfg = config_from_hf(json.loads(hf_cfg.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)

    def run(native):
        import os

        os.environ["MISTRALRS_NATIVE"] = "1" if native else "0"
        import mistralrs_tpu.native as N

        N._tried = False  # re-evaluate the env switch
        N._lib = None
        pc = PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                            prefill_buckets=(8, 16), dtype=jnp.float32)
        eng = Engine(TextPipeline(cfg, params, make_rope(cfg), pc), eos_token_ids=set())
        kind = type(eng.block_manager).__name__
        rng = np.random.default_rng(7)
        toks, _ = eng.generate(rng.integers(3, 120, size=9).tolist(),
                               SamplingParams(max_len=10))
        return kind, toks

    k_nat, t_nat = run(True)
    k_py, t_py = run(False)
    import os

    os.environ.pop("MISTRALRS_NATIVE", None)
    import mistralrs_tpu.native as N

    N._tried = False
    N._lib = None
    assert k_nat == "NativeBlockManager" and k_py == "BlockManager"
    assert t_nat == t_py
