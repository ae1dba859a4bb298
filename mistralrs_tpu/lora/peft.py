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
    """Find PEFT adapter dirs under an X-LoRA model dir: `<root>/adapters/*/`
    or direct subdirs holding an adapter_config.json (ref xlora loading —
    the ordering file names adapters stored inside the model repo)."""
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
