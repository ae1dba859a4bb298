"""TOML model selector.

Reference parity: mistralrs-core/src/toml_selector.rs (:26-296) + the
`toml-selectors/*.toml` examples — one file describes the whole model
composition: base model ([model] with model_id / quantized_model_id+
quantized_filename / adapters_model_id+order), optional [speculative]
(gamma + draft_model) and optional [anymoe] (dataset + experts + config).
Model ids are local directories/files (no hub fetch in this environment).
"""

from __future__ import annotations

import dataclasses
import json
import tomllib
from typing import Any


@dataclasses.dataclass
class TomlSelection:
    raw: dict[str, Any]

    @classmethod
    def from_file(cls, path: str) -> "TomlSelection":
        with open(path, "rb") as f:
            return cls(tomllib.load(f))

    @classmethod
    def from_str(cls, text: str) -> "TomlSelection":
        return cls(tomllib.loads(text))


def _load_base(model: dict[str, Any], pc, dtype, mesh):
    """[model] table -> (cfg, params, rope, tokenizer)."""
    import jax.numpy as jnp

    from mistralrs_tpu.utils.tokenizer import TokenizerWrapper

    if "quantized_model_id" in model:
        import os

        from mistralrs_tpu.pipeline.gguf import load_gguf_model

        path = model["quantized_model_id"]
        fname = model.get("quantized_filename")
        files = [os.path.join(path, fname)] if fname and os.path.isdir(path) else [path]
        cfg, params, rope, tokenizer = load_gguf_model(files)
        if model.get("tok_model_id"):
            try:
                tokenizer = TokenizerWrapper.from_hf_dir(model["tok_model_id"])
            except Exception:
                pass  # fall back to the GGUF-embedded tokenizer
        return cfg, params, rope, tokenizer
    from mistralrs_tpu.models.loader import load_hf_model

    model_id = model.get("model_id") or model.get("adapters_model_id")
    cfg, params, rope = load_hf_model(model_id, dtype=dtype)
    tokenizer = TokenizerWrapper.from_hf_dir(model_id)
    return cfg, params, rope, tokenizer


def runner_from_toml(path_or_text: str, pc=None, dtype=None, mesh=None,
                     is_file: bool = True, prompt_lookup_gamma: int | None = None,
                     truncate_sequence: bool = True, prefix_cache: bool = True,
                     prefix_cache_pages: int | None = None):
    """Build a Runner from a TOML selection (ref TomlSelector -> loaders)."""
    import jax.numpy as jnp

    from mistralrs_tpu.api import Runner
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    sel = (TomlSelection.from_file(path_or_text) if is_file
           else TomlSelection.from_str(path_or_text))
    doc = sel.raw
    dtype = dtype or jnp.bfloat16
    pc = pc or PipelineConfig()
    model = doc["model"]

    cfg, params, rope, tokenizer = _load_base(model, pc, dtype, mesh)

    adapter_names: list[str] = []
    xlora_path = model.get("xlora_model_id")
    if model.get("adapters") or model.get("adapters_model_id") or xlora_path:
        from mistralrs_tpu.lora import (
            Ordering, apply_lora_to_params, discover_adapters,
            load_peft_adapter,
        )

        paths = model.get("adapters") or (
            [model["adapters_model_id"]] if model.get("adapters_model_id")
            else discover_adapters(xlora_path)
        )
        if not paths:
            raise ValueError(f"no adapters found for {model!r}")
        ads = [load_peft_adapter(p) for p in paths]
        if model.get("order"):
            ads = Ordering.from_file(model["order"]).sort_adapters(ads)
        params = apply_lora_to_params(params, cfg, ads, dtype=dtype)
        adapter_names = [a.name for a in ads]

    if "anymoe" in doc:
        am = doc["anymoe"]
        amc = am.get("config", {})
        from mistralrs_tpu.amoe import (
            AnyMoeConfig, convert_to_anymoe, convert_to_anymoe_lora,
            pretrain_gates,
        )
        from mistralrs_tpu.models.loader import load_hf_model as _lh

        expert_type = amc.get("expert_type", "fine_tuned")
        acfg = AnyMoeConfig(
            lr=amc.get("lr", 1e-3),
            epochs=amc.get("epochs", 100),
            batch_size=amc.get("batch_size", 4),
            gate_model_id=amc.get("gate_model_id"),
            layers=am.get("layers"),
            expert_type=expert_type,
        )
        if expert_type == "lora_adapter":
            # model_ids are PEFT adapter dirs (ref AnyMoeExpertType::LoraAdapter)
            from mistralrs_tpu.lora import load_peft_adapter

            ads = [load_peft_adapter(p) for p in am.get("model_ids", [])]
            params = convert_to_anymoe_lora(params, cfg, ads, acfg)
        else:
            experts = [_lh(mid, dtype=dtype)[1] for mid in am.get("model_ids", [])]
            params = convert_to_anymoe(params, cfg, experts, acfg)
        if am.get("dataset_json"):
            with open(am["dataset_json"]) as f:
                rows = json.load(f)
            dataset = [
                (tokenizer.encode(r["prompt"]), int(r["expert"])) for r in rows
            ]
            params = pretrain_gates(params, cfg, rope, dataset, acfg)
        elif acfg.gate_model_id:
            from mistralrs_tpu.amoe import load_gates

            try:
                params = load_gates(acfg.gate_model_id, params)
            except FileNotFoundError:
                pass

    if xlora_path:
        # ref TomlModelSelected::XLora -> XLoraPipeline (docs/TOML_SELECTOR.md)
        import os

        from mistralrs_tpu.lora.xlora import (
            XLoraConfig, XLoraPipeline, classifier_from_safetensors,
        )

        xcfg = XLoraConfig.from_json_file(
            os.path.join(xlora_path, "xlora_config.json"))
        clf = classifier_from_safetensors(
            os.path.join(xlora_path, "xlora_classifier.safetensors"),
            dtype=dtype)
        pipe = XLoraPipeline(cfg, params, rope, pc, classifier=clf, xcfg=xcfg,
                             n_adapters=len(adapter_names), mesh=mesh)
    else:
        pipe = TextPipeline(cfg, params, rope, pc, mesh=mesh)

    if "speculative" in doc:
        sp = doc["speculative"]
        if sp.get("draft_model") in ("prompt-lookup", "ngram"):
            # draftless n-gram speculative decoding (no reference equivalent)
            from mistralrs_tpu.pipeline.speculative import PromptLookupPipeline

            pipe = PromptLookupPipeline(
                pipe, gamma=int(sp.get("gamma", 4)),
                ngram_max=int(sp.get("ngram_max", 3)),
                ngram_min=int(sp.get("ngram_min", 1)))
        else:
            # a present-but-empty draft_model should error loudly below,
            # not silently fall back to a different decoding mode
            dcfg, dparams, drope, _ = _load_base(sp["draft_model"], pc, dtype, mesh)
            from mistralrs_tpu.pipeline.speculative import SpeculativePipeline

            draft = TextPipeline(dcfg, dparams, drope, pc, mesh=mesh)
            pipe = SpeculativePipeline(pipe, draft, gamma=int(sp.get("gamma", 4)))

    if prompt_lookup_gamma and "speculative" not in doc:
        from mistralrs_tpu.pipeline.speculative import PromptLookupPipeline

        pipe = PromptLookupPipeline(pipe, gamma=prompt_lookup_gamma)
    engine = Engine(
        pipe,
        eos_token_ids=tokenizer.eos_token_ids if tokenizer else set(),
        detokenizer=tokenizer.detokenizer() if tokenizer else None,
        grammar_vocab=tokenizer.grammar_vocab() if tokenizer else None,
        truncate_sequence=truncate_sequence,
        prefix_cache=prefix_cache,
        prefix_cache_pages=prefix_cache_pages,
    )
    runner = Runner.from_engine(engine, tokenizer)
    runner.adapter_names = adapter_names
    return runner
