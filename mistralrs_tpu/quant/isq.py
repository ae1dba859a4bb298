"""ISQ — in-situ quantization of safetensors weights at load time.

Reference parity: mistralrs-core/src/pipeline/isq.rs (`IsqModel::quantize`
:78-209, `parse_isq_value` :32-76) + topology/mod.rs (YAML layer-range ISQ
:92-129). The reference quantizes each `QuantMethod` tensor on a rayon pool;
here quantization is vectorized numpy per tensor at load (and could shard
across processes later), producing the same packed device formats the GGUF
path uses — one quantized execution path for both (SURVEY.md §7 step 3).
"""

from __future__ import annotations

from typing import Any

from mistralrs_tpu.gguf.reader import GGMLType

# ref parse_isq_value: accepted spellings
_ISQ_NAMES: dict[str, GGMLType] = {
    "Q4_0": GGMLType.Q4_0,
    "Q4_1": GGMLType.Q4_1,
    "Q5_0": GGMLType.Q5_0,
    "Q5_1": GGMLType.Q5_1,
    "Q8_0": GGMLType.Q8_0,
    "Q2K": GGMLType.Q2_K,
    "Q3K": GGMLType.Q3_K,
    "Q4K": GGMLType.Q4_K,
    "Q5K": GGMLType.Q5_K,
    "Q6K": GGMLType.Q6_K,
    "Q8K": GGMLType.Q8_K,
    "Q2_K": GGMLType.Q2_K,
    "Q3_K": GGMLType.Q3_K,
    "Q4_K": GGMLType.Q4_K,
    "Q5_K": GGMLType.Q5_K,
    "Q6_K": GGMLType.Q6_K,
    "Q8_K": GGMLType.Q8_K,
}

# formats we can quantize *into* (kquants.QUANTIZERS)
SUPPORTED_ISQ = {
    GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
    GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
}


def parse_isq(value: str):
    """-> GGMLType | HqqType (ref parse_isq_value isq.rs:32-76 incl. HQQ)."""
    v = value.strip().upper()
    if v.startswith("HQQ"):
        from mistralrs_tpu.quant.hqq import HqqType

        bits = int(v[3:])
        if bits not in (1, 2, 3, 4, 8):
            raise ValueError(f"HQQ bits must be 1/2/3/4/8, got {value!r}")
        return HqqType(bits)
    if v not in _ISQ_NAMES:
        raise ValueError(
            f"unknown ISQ type {value!r}; supported: {sorted(_ISQ_NAMES)} + HQQ1-8"
        )
    g = _ISQ_NAMES[v]
    if g not in SUPPORTED_ISQ:
        raise ValueError(
            f"ISQ {value!r} parsed but no quantizer implemented yet "
            f"(have: {sorted(t.name for t in SUPPORTED_ISQ)})"
        )
    return g


class Topology:
    """Per-layer ISQ assignment from YAML ranges (ref topology/mod.rs).

    YAML shape:
        0-8:
          isq: Q3K
        8-16:
          isq: Q4K
    Ranges are [start, end); later entries override earlier overlaps.
    A range with no `isq` leaves those layers unquantized.
    """

    def __init__(self, per_layer: dict[int, GGMLType | None]):
        self.per_layer = per_layer

    @classmethod
    def from_yaml_str(cls, text: str, num_layers: int | None = None) -> "Topology":
        import yaml

        doc = yaml.safe_load(text) or {}
        per_layer: dict[int, GGMLType | None] = {}
        for rng, opts in doc.items():
            rng = str(rng)
            if "-" in rng:
                lo, hi = rng.split("-", 1)
                lo, hi = int(lo), int(hi)
            else:
                lo = int(rng)
                hi = lo + 1
            if hi < lo:
                raise ValueError(f"topology range {rng!r} is inverted")
            isq = None
            if opts and opts.get("isq"):
                isq = parse_isq(str(opts["isq"]))
            for i in range(lo, hi):
                per_layer[i] = isq
        if num_layers is not None:
            for i in per_layer:
                if i >= num_layers:
                    raise ValueError(f"topology layer {i} >= num_layers {num_layers}")
        return cls(per_layer)

    @classmethod
    def from_yaml_file(cls, path: str, num_layers: int | None = None) -> "Topology":
        with open(path) as f:
            return cls.from_yaml_str(f.read(), num_layers)

    def isq_for_layer(self, layer_idx: int, default: GGMLType | None) -> GGMLType | None:
        if layer_idx in self.per_layer:
            return self.per_layer[layer_idx]
        return default


def quantizable(shape: tuple[int, ...], gtype) -> bool:
    """A (out, in) weight is quantizable if `in` is a whole number of blocks."""
    from mistralrs_tpu.quant.hqq import HqqType

    if isinstance(gtype, HqqType):
        return len(shape) == 2 and shape[1] % gtype.group_size == 0
    from mistralrs_tpu.gguf.reader import GGML_BLOCK_INFO

    be, _ = GGML_BLOCK_INFO[gtype]
    return len(shape) == 2 and shape[1] % be == 0
