"""TOML selector, bench harness, and engine-aux (terminate/logging/reboot)
tests."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch
import transformers as tf

from mistralrs_tpu.engine.engine import Engine, GenerationRequest
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt") / "model"
    torch.manual_seed(3)
    hf_cfg = tf.LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=128,
    )
    tf.LlamaForCausalLM(hf_cfg).save_pretrained(str(d), safe_serialization=True)
    from tokenizers import Tokenizer, models, pre_tokenizers

    tok = Tokenizer(models.WordLevel({f"w{i}": i for i in range(128)}, unk_token="w0"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text("{}")
    return str(d)


def _pc():
    return PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                          prefill_buckets=(8, 16), dtype=jnp.float32)


def test_toml_plain(tiny_ckpt):
    from mistralrs_tpu.toml_selector import runner_from_toml

    toml = f'''
[model]
model_id = "{tiny_ckpt}"
arch = "llama"
'''
    r = runner_from_toml(toml, pc=_pc(), dtype=jnp.float32, is_file=False)
    resp = r.send_completion_request("w5 w6 w7", SamplingParams(max_len=4))
    assert resp.choices[0].text
    r.shutdown()


def test_toml_speculative(tiny_ckpt):
    from mistralrs_tpu.toml_selector import runner_from_toml

    toml = f'''
[model]
model_id = "{tiny_ckpt}"

[speculative]
gamma = 2

[speculative.draft_model]
model_id = "{tiny_ckpt}"
'''
    r = runner_from_toml(toml, pc=_pc(), dtype=jnp.float32, is_file=False)
    assert r.handle.engine.is_speculative
    resp = r.send_completion_request("w5 w6 w7 w8", SamplingParams(max_len=5))
    assert resp.choices[0].text
    r.shutdown()


def test_toml_anymoe(tiny_ckpt, tmp_path):
    from mistralrs_tpu.toml_selector import runner_from_toml

    rows = [{"prompt": "w5 w6", "expert": 0}, {"prompt": "w100 w101", "expert": 1}]
    ds = tmp_path / "amoe.json"
    ds.write_text(json.dumps(rows))
    toml = f'''
[model]
model_id = "{tiny_ckpt}"

[anymoe]
dataset_json = "{ds}"
model_ids = ["{tiny_ckpt}"]
layers = [0]

[anymoe.config]
epochs = 5
'''
    r = runner_from_toml(toml, pc=_pc(), dtype=jnp.float32, is_file=False)
    resp = r.send_completion_request("w5 w6 w7", SamplingParams(max_len=3))
    assert resp.choices[0].text
    r.shutdown()


def test_bench_harness(tiny_ckpt):
    from mistralrs_tpu.bench import run_bench
    from mistralrs_tpu.models.loader import load_hf_model, make_rope

    cfg, params, rope = load_hf_model(tiny_ckpt, dtype=jnp.float32)
    eng = Engine(TextPipeline(cfg, params, rope, _pc()), eos_token_ids=set())
    r = run_bench(eng, prompt_len=8, gen_len=8, repetitions=2, concurrency=2,
                  vocab=128)
    assert r["tg"] and r["tg"]["mean"] > 0
    assert r["pp"] and r["pp"]["mean"] > 0


def test_terminate_all_next_step(tiny_ckpt):
    from mistralrs_tpu.models.loader import load_hf_model

    cfg, params, rope = load_hf_model(tiny_ckpt, dtype=jnp.float32)
    eng = Engine(TextPipeline(cfg, params, rope, _pc()), eos_token_ids=set())
    g = eng.add_request(GenerationRequest([5, 6, 7], SamplingParams(max_len=50)))
    eng.step()  # prefill
    eng.step()  # one decode
    eng.terminate_all_next_step = True
    eng.step()
    assert g.all_done()
    assert g.seqs[0].stop_reason is not None
    assert not eng.has_work


def test_request_logging(tiny_ckpt, tmp_path):
    from mistralrs_tpu.models.loader import load_hf_model

    cfg, params, rope = load_hf_model(tiny_ckpt, dtype=jnp.float32)
    eng = Engine(TextPipeline(cfg, params, rope, _pc()), eos_token_ids=set())
    log = tmp_path / "reqs.jsonl"
    eng.request_log_file = str(log)
    eng.generate([5, 6, 7], SamplingParams(max_len=3))
    lines = [json.loads(x) for x in log.read_text().splitlines()]
    events = [x["event"] for x in lines]
    assert "request" in events and "response" in events


def test_throughput_logging(tiny_ckpt):
    from mistralrs_tpu.models.loader import load_hf_model

    cfg, params, rope = load_hf_model(tiny_ckpt, dtype=jnp.float32)
    eng = Engine(TextPipeline(cfg, params, rope, _pc()), eos_token_ids=set())
    eng.throughput_logging = True
    eng.generate([5, 6, 7], SamplingParams(max_len=3))
    assert eng.last_throughput is not None
    assert eng.last_throughput["completion_tok_s"] > 0


def test_engine_handle_reboots_dead_thread(tiny_ckpt):
    from mistralrs_tpu.api import Runner
    from mistralrs_tpu.models.loader import load_hf_model
    from mistralrs_tpu.utils.tokenizer import TokenizerWrapper

    cfg, params, rope = load_hf_model(tiny_ckpt, dtype=jnp.float32)
    tok = TokenizerWrapper.from_hf_dir(tiny_ckpt)
    r = Runner.from_parts(cfg, params, rope, tok, pc=_pc())
    # kill the engine thread (simulates a crash; ref reboot lib.rs:333-397)
    import ctypes

    t = r.handle._thread
    ctypes.pythonapi.PyThreadState_SetAsyncExc(
        ctypes.c_long(t.ident), ctypes.py_object(SystemExit)
    )
    t.join(timeout=5)
    assert not t.is_alive()
    resp = r.send_completion_request("w5 w6", SamplingParams(max_len=3))
    assert resp.choices[0].text
    r.shutdown()


def test_kv_pool_autosizing(tiny_ckpt):
    from mistralrs_tpu.utils.memory import PagedCacheConfig, calculate_num_pages

    # explicit budget: 1 MB, page cost = 2*L*Hkv*D*page*2B
    n = calculate_num_pages(
        PagedCacheConfig(mem_bytes=1 << 20, page_size=16),
        num_layers=2, num_kv_heads=2, head_dim=16, dtype_bytes=2,
    )
    assert n == (1 << 20) // (2 * 2 * 2 * 16 * 16 * 2)
    # context-length sizing
    n = calculate_num_pages(
        PagedCacheConfig(context_len=256, page_size=16),
        num_layers=2, num_kv_heads=2, head_dim=16, max_seqs=4,
    )
    assert n == 16 * 4 + 1
    # num_pages=None auto path builds a working pipeline (CPU: falls back 512)
    import jax.numpy as jnp

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import load_hf_model
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg, params, rope = load_hf_model(tiny_ckpt, dtype=jnp.float32)
    pc = PipelineConfig(page_size=4, num_pages=None, max_seqs=2, max_model_len=128,
                        prefill_buckets=(8, 16), dtype=jnp.float32)
    pipe = TextPipeline(cfg, params, rope, pc)
    assert pipe.pc.num_pages >= 2
    eng = Engine(pipe, eos_token_ids=set())
    toks, _ = eng.generate([5, 6, 7], SamplingParams(max_len=3))
    assert len(toks) == 3


def test_debug_utils(tmp_path, monkeypatch):
    from mistralrs_tpu.utils import debug as D

    monkeypatch.setenv(D.DEBUG_ENV, "1")
    assert D.debug_enabled()

    class FakeInfo:
        def __init__(self, g, s):
            from mistralrs_tpu.gguf.reader import GGMLType

            self.ggml_type = GGMLType.Q4_K
            self.shape = s

    class FakeG:
        tensors = {"a.weight": FakeInfo(None, (4, 8))}

    out = tmp_path / "dump.txt"
    D.maybe_dump_gguf_tensors(FakeG(), str(out))
    assert "Q4_K" in out.read_text()


def test_perplexity_harness(tiny_ckpt):
    """PPL matches a direct HF computation on the same tokens, and Q8_0 ISQ
    stays close to f32 (the BASELINE quality-delta measurement path)."""
    import torch
    import transformers as tf

    from mistralrs_tpu.models.loader import load_hf_model
    from mistralrs_tpu.perplexity import perplexity_over_tokens

    cfg, params, rope = load_hf_model(tiny_ckpt, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    tokens = rng.integers(3, 120, size=60).tolist()
    ppl = perplexity_over_tokens(cfg, params, rope, tokens, ctx=32, stride=32)

    hfm = tf.LlamaForCausalLM.from_pretrained(tiny_ckpt).eval().float()
    total, cnt = 0.0, 0
    for s in range(0, len(tokens) - 1, 32):
        w = tokens[s : s + 32]
        if len(w) < 2:
            break
        ids = torch.tensor([w])
        with torch.no_grad():
            logits = hfm(ids).logits
        logp = torch.log_softmax(logits[:, :-1].float(), -1)
        nll = -logp.gather(-1, ids[:, 1:, None])[..., 0]
        total += float(nll.sum()); cnt += nll.numel()
    import math

    want = math.exp(total / cnt)
    assert abs(ppl - want) / want < 0.02, (ppl, want)

    q8 = load_hf_model(tiny_ckpt, dtype=jnp.float32, isq="Q8_0")
    ppl_q8 = perplexity_over_tokens(q8[0], q8[1], q8[2], tokens, ctx=32, stride=32)
    assert abs(ppl_q8 - ppl) / ppl < 0.05

    # Q4_K: the BASELINE.json format — quantization-distortion delta on a
    # fixed stream (the offline-measurable component of the PPL target;
    # PARITY.md "Cross-implementation parity status")
    q4 = load_hf_model(tiny_ckpt, dtype=jnp.float32, isq="Q4_K")
    ppl_q4 = perplexity_over_tokens(q4[0], q4[1], q4[2], tokens, ctx=32, stride=32)
    assert abs(ppl_q4 - ppl) / ppl < 0.35, (ppl_q4, ppl)  # 4-bit on random init


def test_driver_bench_q6k_perm_matches_packer():
    """bench.py builds synthetic q6k Linears directly in the device layout;
    its permutation helper must stay bit-identical to pack_q6k's."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "driver_bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from mistralrs_tpu.gguf.reader import GGMLType
    from mistralrs_tpu.quant import kquants
    from mistralrs_tpu.quant.gguf_linear import linear_from_gguf, q6k_chunk_size

    for K in (512, 1024, 2816):  # 2816 = 256*11 exercises the G=64 path
        O = 256
        w = np.random.default_rng(0).standard_normal((O, K)).astype(np.float32) * 0.1
        lin = linear_from_gguf(kquants.quantize(w, GGMLType.Q6_K), GGMLType.Q6_K, (O, K))
        G = q6k_chunk_size(K)
        assert lin.meta == G
        # bench builds its synthetic q6k Linears from the SAME shared helper
        # the packer uses (gguf_linear.q6k_perm) — one layout definition
        blin = bench._random_q6k_linear(np.random.default_rng(0), K, O, None)
        np.testing.assert_array_equal(
            np.asarray(blin.data["perm"]), np.asarray(lin.data["perm"]))


def test_toml_xlora(tiny_ckpt, tmp_path):
    """xlora_model_id in the [model] table must build an XLoraPipeline
    (was silently ignored — served the plain base model)."""
    import json as _json
    import shutil

    import numpy as np
    from safetensors.numpy import save_file

    from mistralrs_tpu.lora.lora import LoraAdapter
    from mistralrs_tpu.lora.peft import save_peft_adapter
    from mistralrs_tpu.lora.xlora import XLoraPipeline
    from mistralrs_tpu.toml_selector import runner_from_toml

    rng = np.random.default_rng(5)
    weights = {}
    for layer in range(2):
        for proj, (i, o) in (("q_proj", (32, 32)), ("v_proj", (32, 16))):
            A = (rng.standard_normal((4, i)) * 0.02).astype(np.float32)
            weights[f"{layer}.{proj}"] = (A, np.zeros((o, 4), np.float32))
    xdir = tmp_path / "xlora"
    (xdir / "adapters").mkdir(parents=True)
    save_peft_adapter(str(xdir / "adapters" / "a1"),
                      LoraAdapter(name="a1", r=4, alpha=8, weights=weights))
    (xdir / "xlora_config.json").write_text(_json.dumps({
        "hidden_size": 32, "xlora_depth": 1, "enable_softmax": True,
    }))
    save_file({
        "last.weight": (rng.standard_normal((2, 32)) * 0.02).astype(np.float32),
        "last.bias": np.zeros((2,), np.float32),
    }, str(xdir / "xlora_classifier.safetensors"))

    text = f'''
[model]
model_id = "{tiny_ckpt}"
xlora_model_id = "{xdir}"
'''
    runner = runner_from_toml(text, pc=_pc(), dtype=jnp.float32, is_file=False)
    try:
        assert isinstance(runner.handle.engine.pipeline, XLoraPipeline)
        assert runner.adapter_names == ["a1"]
    finally:
        runner.shutdown()
