"""PEFT adapter checkpoint loading.

Reference parity: mistralrs-core/src/pipeline/paths.rs `get_xlora_paths`
(adapter_config.json + adapter_model.safetensors discovery) and
lora/mod.rs adapter weight loading. The on-disk format is HF PEFT:
keys `base_model.model.model.layers.{i}.{submodule}.{proj}.lora_{A,B}.weight`
with A: [r, in], B: [out, r].
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

from mistralrs_tpu.lora.lora import LoraAdapter

_KEY_RE = re.compile(
    r"^base_model\.model\.model\.layers\.(\d+)\.(?:self_attn|mlp|block_sparse_moe)\."
    r"([A-Za-z0-9_]+)\.lora_([AB])\.weight$"
)


def load_peft_adapter(path: str, name: str | None = None) -> LoraAdapter:
    """Load one PEFT adapter directory (adapter_config.json +
    adapter_model.safetensors)."""
    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    r = int(cfg.get("r", 8))
    alpha = float(cfg.get("lora_alpha", r))
    name = name or cfg.get("adapter_name") or os.path.basename(os.path.normpath(path))

    from safetensors import safe_open

    st = os.path.join(path, "adapter_model.safetensors")
    pairs: dict[str, dict[str, np.ndarray]] = {}
    with safe_open(st, framework="np") as h:
        for key in h.keys():
            m = _KEY_RE.match(key)
            if m is None:
                continue
            layer, proj, ab = int(m.group(1)), m.group(2), m.group(3)
            pairs.setdefault(f"{layer}.{proj}", {})[ab] = h.get_tensor(key)
    weights = {}
    for k, d in pairs.items():
        if "A" in d and "B" in d:
            weights[k] = (d["A"], d["B"])
    return LoraAdapter(name=name, r=r, alpha=alpha, weights=weights)


def save_peft_adapter(path: str, adapter: LoraAdapter) -> None:
    """Write a LoraAdapter back out in PEFT format (testing / AnyMoE export)."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    cfg = {
        "r": adapter.r,
        "lora_alpha": adapter.alpha,
        "peft_type": "LORA",
        "adapter_name": adapter.name,  # our extension; PEFT uses the dir name
        "target_modules": sorted({k.split(".", 1)[1] for k in adapter.weights}),
    }
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump(cfg, f)
    tensors = {}
    for k, (A, B) in adapter.weights.items():
        layer, proj = k.split(".", 1)
        sub = "self_attn" if proj in ("q_proj", "k_proj", "v_proj", "o_proj", "dense") else "mlp"
        pre = f"base_model.model.model.layers.{layer}.{sub}.{proj}"
        tensors[f"{pre}.lora_A.weight"] = np.ascontiguousarray(A)
        tensors[f"{pre}.lora_B.weight"] = np.ascontiguousarray(B)
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))


def discover_adapters(root: str) -> list[str]:
    """Find PEFT adapter dirs under an X-LoRA model dir, in CLASSIFIER
    order. The classifier emits one scaling per adapter in training order,
    so adapter order is load-bearing (ref model_selected.rs XLora makes the
    ordering file mandatory for this). Priority:

    1. xlora_config.json's ``adapters`` mapping ({name: path}, insertion-
       ordered — what PEFT X-LoRA checkpoints save at train time); relative
       paths resolve against `root`, unresolvable saved paths fall back to
       `<root>/adapters/<name>` then `<root>/<name>`.
    2. Directory scan of `<root>/adapters/*/` or direct subdirs holding an
       adapter_config.json, sorted by name — only unambiguous for a single
       adapter; multi-adapter dirs without (1) must pass an ordering file
       (checked by the caller, server/cli.py)."""
    xcfg_path = os.path.join(root, "xlora_config.json")
    if os.path.isfile(xcfg_path):
        with open(xcfg_path) as f:
            mapping = json.load(f).get("adapters")
        if isinstance(mapping, dict) and mapping:
            out = []
            for name, saved in mapping.items():
                for cand in (
                    saved if os.path.isabs(saved) else os.path.join(root, saved),
                    os.path.join(root, "adapters", name),
                    os.path.join(root, name),
                ):
                    if os.path.isfile(os.path.join(cand, "adapter_config.json")):
                        out.append(cand)
                        break
                else:
                    raise FileNotFoundError(
                        f"xlora_config.json names adapter {name!r} at "
                        f"{saved!r} but no adapter_config.json was found "
                        f"there or under {root!r}"
                    )
            return out
    cands = []
    for base in (os.path.join(root, "adapters"), root):
        if not os.path.isdir(base):
            continue
        for name in sorted(os.listdir(base)):
            d = os.path.join(base, name)
            if os.path.isfile(os.path.join(d, "adapter_config.json")):
                cands.append(d)
        if cands:
            return cands
    return cands
