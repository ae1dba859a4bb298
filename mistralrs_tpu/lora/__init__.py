from mistralrs_tpu.lora.lora import (
    LoraAdapter,
    activate_adapters,
    apply_lora_to_params,
    make_lora,
    merge_lora,
)
from mistralrs_tpu.lora.peft import discover_adapters, load_peft_adapter
from mistralrs_tpu.lora.ordering import Ordering

__all__ = [
    "LoraAdapter",
    "Ordering",
    "activate_adapters",
    "apply_lora_to_params",
    "discover_adapters",
    "load_peft_adapter",
    "make_lora",
    "merge_lora",
]
