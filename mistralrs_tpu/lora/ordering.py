"""Adapter ordering file.

Reference parity: mistralrs-core/src/lora/mod.rs `Ordering` (:25) — a JSON
file fixing (a) the adapter stacking order (`order`) so X-LoRA classifier
outputs line up with adapter indices, and (b) an optional layer->adapter-set
map (`layers`) restricting which adapters wrap which layers.
"""

from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass
class Ordering:
    order: list[str]
    layers: dict[str, int] | None = None
    base_model_id: str | None = None

    @classmethod
    def from_file(cls, path: str) -> "Ordering":
        with open(path) as f:
            d = json.load(f)
        return cls(
            order=list(d["order"]),
            layers=d.get("layers"),
            base_model_id=d.get("base_model_id"),
        )

    def sort_adapters(self, adapters):
        """Return adapters sorted to match `order` (unknown names error)."""
        by_name = {a.name: a for a in adapters}
        missing = [n for n in self.order if n not in by_name]
        if missing:
            raise ValueError(f"ordering names adapters not provided: {missing}")
        return [by_name[n] for n in self.order]
