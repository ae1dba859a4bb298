"""CLI subcommand coverage: every ModelSelected variant boots the matching
pipeline (ref model_selected.rs:21-312, main.rs loader dispatch), plus
--chat-template resolution and the bundled template set."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import transformers as tf

from mistralrs_tpu.server.cli import build_parser, runner_from_args
from mistralrs_tpu.pipeline.text import PipelineConfig


def _pc():
    return PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                          prefill_buckets=(8, 16), dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_ckpt") / "model"
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


@pytest.fixture(scope="module")
def peft_adapter(tmp_path_factory):
    """A PEFT adapter dir targeting q_proj/v_proj of the tiny model."""
    from mistralrs_tpu.lora.lora import LoraAdapter
    from mistralrs_tpu.lora.peft import save_peft_adapter

    rng = np.random.default_rng(5)
    r = 4
    weights = {}
    for layer in range(2):
        for proj, (i, o) in (("q_proj", (32, 32)), ("v_proj", (32, 16))):
            # torch/PEFT layout: A [r, in], B [out, r]
            A = (rng.standard_normal((r, i)) * 0.02).astype(np.float32)
            B = np.zeros((o, r), np.float32)
            weights[f"{layer}.{proj}"] = (A, B)
    ad = LoraAdapter(name="a1", r=r, alpha=8, weights=weights)
    d = tmp_path_factory.mktemp("adapter") / "a1"
    save_peft_adapter(str(d), ad)
    return str(d)


def _parse_and_boot(argv):
    args = build_parser().parse_args(argv)
    if getattr(args, "tgt_non_granular_index", None) is not None:
        args.max_seqs = 1
    return runner_from_args(args, _pc(), None)


def _decodes(runner):
    """Drive through the EngineHandle (the serve thread owns the engine —
    calling engine.generate directly would race it)."""
    import time

    from mistralrs_tpu.engine.engine import GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams

    try:
        import uuid

        group = runner.handle.submit(
            GenerationRequest([3, 5, 7, 9], SamplingParams(max_len=4),
                              request_id=uuid.uuid4().hex))
        deadline = time.time() + 120
        while not group.all_done():
            assert time.time() < deadline, "decode timed out"
            time.sleep(0.005)
        toks = group.seqs[0].generated_tokens
        assert len(toks) == 4
        return toks
    finally:
        runner.shutdown()


def test_cli_plain(tiny_ckpt):
    runner, _ = _parse_and_boot(["plain", "--model", tiny_ckpt, "--dtype", "f32"])
    _decodes(runner)


def test_cli_lora(tiny_ckpt, peft_adapter):
    runner, _ = _parse_and_boot(
        ["lora", "--model", tiny_ckpt, "--dtype", "f32",
         "--adapters-model-id", peft_adapter])
    assert runner.adapter_names == ["a1"]
    from mistralrs_tpu.quant.qlinear import Linear
    import jax

    kinds = {l.kind for l in jax.tree.leaves(
        runner.handle.engine.pipeline.params,
        is_leaf=lambda x: isinstance(x, Linear)) if isinstance(l, Linear)}
    assert "lora" in kinds
    _decodes(runner)


def _write_xlora_dir(tmp_path, peft_adapter):
    """X-LoRA model dir: config + torch-layout classifier + bundled adapter."""
    import shutil

    from safetensors.numpy import save_file

    xdir = tmp_path / "xlora"
    (xdir / "adapters").mkdir(parents=True)
    shutil.copytree(peft_adapter, str(xdir / "adapters" / "a1"))
    (xdir / "xlora_config.json").write_text(json.dumps({
        "hidden_size": 32, "xlora_depth": 1, "enable_softmax": True,
    }))
    rng = np.random.default_rng(6)
    # layerwise scalings: out = num_layers * n_adapters = 2 * 1
    save_file({
        "last.weight": (rng.standard_normal((2, 32)) * 0.02).astype(np.float32),
        "last.bias": np.zeros((2,), np.float32),
    }, str(xdir / "xlora_classifier.safetensors"))
    return str(xdir)


def test_cli_x_lora(tiny_ckpt, peft_adapter, tmp_path):
    xdir = _write_xlora_dir(tmp_path, peft_adapter)
    runner, _ = _parse_and_boot(
        ["x-lora", "--model", tiny_ckpt, "--dtype", "f32",
         "--xlora-model-id", xdir])
    from mistralrs_tpu.lora.xlora import XLoraPipeline

    assert isinstance(runner.handle.engine.pipeline, XLoraPipeline)
    _decodes(runner)


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    from test_gguf_pipeline import _weights, _write_model_gguf

    path = str(tmp_path_factory.mktemp("gguf") / "tiny.gguf")
    _write_model_gguf(path, _weights())
    return path


def test_cli_gguf(tiny_gguf, tiny_ckpt):
    runner, _ = _parse_and_boot(
        ["gguf", "--model", tiny_gguf, "--tokenizer", tiny_ckpt])
    _decodes(runner)


def test_cli_lora_gguf(tiny_gguf, tiny_ckpt, tmp_path_factory):
    """LoRA over a GGUF base: adapters wrap the quantized linears unmerged
    (ref LoraGGUF, xlora_models/quantized_llama.rs)."""
    from mistralrs_tpu.lora.lora import LoraAdapter
    from mistralrs_tpu.lora.peft import save_peft_adapter

    rng = np.random.default_rng(7)
    r = 4
    weights = {}
    for layer in range(3):  # tiny GGUF model: hidden 256, 3 layers
        # torch/PEFT layout: A [r, in], B [out, r]
        A = (rng.standard_normal((r, 256)) * 0.02).astype(np.float32)
        B = np.zeros((256, r), np.float32)
        weights[f"{layer}.q_proj"] = (A, B)
    d = tmp_path_factory.mktemp("gguf_adapter") / "g1"
    save_peft_adapter(str(d), LoraAdapter(name="g1", r=r, alpha=8, weights=weights))
    runner, _ = _parse_and_boot(
        ["lora-gguf", "--model", tiny_gguf, "--tokenizer", tiny_ckpt,
         "--adapters-model-id", str(d)])
    assert runner.adapter_names == ["g1"]
    _decodes(runner)


@pytest.fixture(scope="module")
def tiny_ggml(tmp_path_factory):
    from test_ggml import _ggml_tensors, _tiny_hf, _write_ggjt

    _, model = _tiny_hf()
    path = str(tmp_path_factory.mktemp("ggml") / "tiny.ggjt")
    vocab = [(f"tok{i}".encode(), 0.0) for i in range(128)]
    _write_ggjt(path, (128, 64, 256, 4, 2, 16, 0), vocab, _ggml_tensors(model))
    return path


def test_cli_ggml(tiny_ggml, tiny_ckpt):
    runner, _ = _parse_and_boot(
        ["ggml", "--model", tiny_ggml, "--tokenizer", tiny_ckpt, "--gqa", "2"])
    assert runner.handle.engine.pipeline.cfg.num_kv_heads == 2
    _decodes(runner)


def test_cli_vision_plain_parses():
    """vision-plain parses to the VisionRunner dispatch (boot needs a full
    vision checkpoint — covered by test_vision.py)."""
    args = build_parser().parse_args(
        ["vision-plain", "--model", "/nonexistent", "--arch", "llava"])
    assert args.which == "vision-plain" and args.arch == "llava"


def test_cli_rejects_unknown_subcommand():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["nonsense", "--model", "x"])


# ------------------------------------------------------------ chat templates
def test_bundled_templates_resolve_and_render():
    from mistralrs_tpu.chat_templates import bundled_names, resolve_chat_template
    from mistralrs_tpu.pipeline.chat_template import apply_chat_template

    names = bundled_names()
    assert {"chatml", "llama2", "llama3", "mistral", "phi3",
            "vicuna", "gemma", "default"} <= set(names)
    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
            {"role": "user", "content": "bye?"}]
    for name in names:
        tpl = resolve_chat_template(name)
        out = apply_chat_template(tpl, msgs, add_generation_prompt=True,
                                  bos_token="<s>", eos_token="</s>")
        assert "hi" in out and "bye?" in out, name


def test_chatml_template_exact():
    from mistralrs_tpu.chat_templates import resolve_chat_template
    from mistralrs_tpu.pipeline.chat_template import apply_chat_template

    out = apply_chat_template(
        resolve_chat_template("chatml"),
        [{"role": "user", "content": "hi"}],
        add_generation_prompt=True, bos_token="", eos_token="")
    assert out == "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"


def test_chat_template_from_custom_files(tmp_path):
    from mistralrs_tpu.chat_templates import resolve_chat_template

    j = tmp_path / "t.json"
    j.write_text(json.dumps({"chat_template": "X{{messages[0]['content']}}"}))
    assert resolve_chat_template(str(j)) == "X{{messages[0]['content']}}"
    raw = tmp_path / "t.jinja"
    raw.write_text("Y{{messages[0]['content']}}")
    assert resolve_chat_template(str(raw)) == "Y{{messages[0]['content']}}"
    with pytest.raises(FileNotFoundError):
        resolve_chat_template("no-such-template")


def test_chat_template_override_changes_prompt(tiny_ckpt):
    """--chat-template wiring: overriding tokenizer.chat_template changes
    the rendered prompt for chat requests (ref main.rs:77,287)."""
    from mistralrs_tpu.api import Runner
    from mistralrs_tpu.chat_templates import resolve_chat_template

    runner = Runner(tiny_ckpt, dtype=jnp.float32, pipeline_config=_pc())
    try:
        base = runner._prompt_from_messages([{"role": "user", "content": "w1 w2"}])
        runner.tokenizer.chat_template = resolve_chat_template("chatml")
        over = runner._prompt_from_messages([{"role": "user", "content": "w1 w2"}])
        assert base != over
    finally:
        runner.shutdown()


def test_cli_x_lora_gguf(tiny_gguf, tiny_ckpt, tmp_path):
    """X-LoRA over a GGUF base (ref XLoraGGUF, xlora_models over quantized
    weights): classifier + bundled adapter dir, dual-pass pipeline boots."""
    import shutil

    from safetensors.numpy import save_file

    from mistralrs_tpu.lora.lora import LoraAdapter
    from mistralrs_tpu.lora.peft import save_peft_adapter

    rng = np.random.default_rng(8)
    r = 4
    weights = {}
    for layer in range(3):  # tiny GGUF model: hidden 256, 3 layers
        A = (rng.standard_normal((r, 256)) * 0.02).astype(np.float32)
        B = np.zeros((256, r), np.float32)
        weights[f"{layer}.q_proj"] = (A, B)
    xdir = tmp_path / "xlora_gguf"
    (xdir / "adapters").mkdir(parents=True)
    save_peft_adapter(str(xdir / "adapters" / "g1"),
                      LoraAdapter(name="g1", r=r, alpha=8, weights=weights))
    (xdir / "xlora_config.json").write_text(json.dumps({
        "hidden_size": 256, "xlora_depth": 1, "enable_softmax": True,
    }))
    # layerwise scalings: out = num_layers * n_adapters = 3 * 1
    save_file({
        "last.weight": (rng.standard_normal((3, 256)) * 0.02).astype(np.float32),
        "last.bias": np.zeros((3,), np.float32),
    }, str(xdir / "xlora_classifier.safetensors"))
    runner, _ = _parse_and_boot(
        ["x-lora-gguf", "--model", tiny_gguf, "--tokenizer", tiny_ckpt,
         "--xlora-model-id", str(xdir)])
    from mistralrs_tpu.lora.xlora import XLoraPipeline

    assert isinstance(runner.handle.engine.pipeline, XLoraPipeline)
    assert runner.adapter_names == ["g1"]
    _decodes(runner)


def test_xlora_adapter_order_from_config(tiny_ckpt, peft_adapter, tmp_path):
    """Multi-adapter X-LoRA dirs: classifier order comes from
    xlora_config.json's 'adapters' mapping (training order), NOT the
    alphabetical directory listing — scalings map to adapters by position."""
    import shutil

    from mistralrs_tpu.lora import discover_adapters

    xdir = tmp_path / "xlora_multi"
    (xdir / "adapters").mkdir(parents=True)
    # directory order sorts [a_code, z_math]; training order is the reverse
    shutil.copytree(peft_adapter, str(xdir / "adapters" / "a_code"))
    shutil.copytree(peft_adapter, str(xdir / "adapters" / "z_math"))
    (xdir / "xlora_config.json").write_text(json.dumps({
        "hidden_size": 32,
        "adapters": {"z_math": "adapters/z_math", "a_code": "adapters/a_code"},
    }))
    got = [p.rsplit("/", 1)[-1] for p in discover_adapters(str(xdir))]
    assert got == ["z_math", "a_code"]


def test_xlora_ambiguous_order_rejected(tiny_ckpt, peft_adapter, tmp_path):
    """Two adapters, no config mapping, no --order: refuse instead of
    silently guessing an order (ref model_selected.rs XLora requires the
    ordering file)."""
    import shutil

    import pytest

    xdir = tmp_path / "xlora_ambig"
    (xdir / "adapters").mkdir(parents=True)
    shutil.copytree(peft_adapter, str(xdir / "adapters" / "a1"))
    shutil.copytree(peft_adapter, str(xdir / "adapters" / "a2"))
    (xdir / "xlora_config.json").write_text(json.dumps({"hidden_size": 32}))
    with pytest.raises(SystemExit, match="order"):
        _parse_and_boot(["x-lora", "--model", tiny_ckpt, "--dtype", "f32",
                         "--xlora-model-id", str(xdir)])


def test_cli_prompt_lookup(tiny_ckpt):
    """--prompt-lookup-gamma wraps the pipeline in draftless n-gram
    speculative decoding."""
    from mistralrs_tpu.pipeline.speculative import PromptLookupPipeline

    runner, _ = _parse_and_boot(
        ["--prompt-lookup-gamma", "4", "plain", "--model", tiny_ckpt,
         "--dtype", "f32"])
    assert isinstance(runner.handle.engine.pipeline, PromptLookupPipeline)
    _decodes(runner)


def test_cli_xlora_prompt_lookup(tiny_ckpt, peft_adapter, tmp_path):
    """PLD over an X-LoRA target: the dual-pass verify fn (XLoraPipeline
    _build_verify_fn) serves run_span(all_positions=True) — this crashed
    with NotImplementedError at the first decode step before."""
    from mistralrs_tpu.pipeline.speculative import PromptLookupPipeline

    xdir = _write_xlora_dir(tmp_path, peft_adapter)
    runner, _ = _parse_and_boot(
        ["--prompt-lookup-gamma", "3", "x-lora", "--model", tiny_ckpt,
         "--dtype", "f32", "--xlora-model-id", xdir])
    pipe = runner.handle.engine.pipeline
    assert isinstance(pipe, PromptLookupPipeline)
    _decodes(runner)


def test_toml_xlora_speculative(tiny_ckpt, peft_adapter, tmp_path):
    """Speculative decoding with an X-LoRA target (the composition
    examples/python/speculative_xlora.py uses; ref TomlSelector XLora +
    [speculative]). Greedy output must equal the X-LoRA target alone."""
    import time
    import uuid

    from mistralrs_tpu.engine.engine import GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.toml_selector import runner_from_toml

    xdir = _write_xlora_dir(tmp_path, peft_adapter)

    def run(spec: bool):
        text = f'[model]\nmodel_id = "{tiny_ckpt}"\nxlora_model_id = "{xdir}"\n'
        if spec:
            text += (f'[speculative]\ngamma = 3\n'
                     f'[speculative.draft_model]\nmodel_id = "{tiny_ckpt}"\n')
        runner = runner_from_toml(text, pc=_pc(), is_file=False)
        try:
            req = GenerationRequest([3, 4, 5, 6, 3, 4], SamplingParams(max_len=10),
                                    request_id=uuid.uuid4().hex)
            group = runner.handle.submit(req)
            while not group.all_done():
                time.sleep(0.02)
            return list(group.seqs[0].tokens)
        finally:
            runner.shutdown()

    assert run(True) == run(False)


def test_cli_truncate_and_prefix_flags(tiny_ckpt):
    """--truncate-sequence off (reference default): over-length prompts get
    an error response instead of silent tail truncation; --prefix-cache-n 0
    disables the prefix cacher."""
    import time
    import uuid

    from mistralrs_tpu.engine.engine import GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams

    runner, _ = _parse_and_boot(
        ["--prefix-cache-n", "0", "plain", "--model", tiny_ckpt,
         "--dtype", "f32"])
    eng = runner.handle.engine
    assert eng.prefix_cacher is None
    assert not eng.truncate_sequence  # CLI default matches the reference
    long_prompt = list(np.random.default_rng(0).integers(3, 120, size=200))
    g = runner.handle.submit(GenerationRequest(
        long_prompt, SamplingParams(max_len=4), request_id=uuid.uuid4().hex))
    for _ in range(200):
        if g.all_done():
            break
        time.sleep(0.02)
    assert g.all_done()
    assert "exceeds max_model_len" in (g.seqs[0].finish_error or "")
    runner.shutdown()
