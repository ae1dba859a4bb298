"""Decoder model zoo.

Reference parity: mistralrs-core/src/models/ — llama, mistral, mixtral, gemma,
gemma2, phi2, phi3, qwen2, starcoder2 (SURVEY.md §2.1 "Text models").

TPU design: instead of nine near-identical per-arch files, one functional
decoder core (`decoder.py`) parameterized by `ModelConfig` (`config.py`)
covers every text architecture; per-arch differences (norm flavor, rope
flavor, block topology, MoE, softcapping, biases) are static config fields
that jit specializes away. Layers are stacked and scanned (`lax.scan`) for
O(1) compile time, which the reference's per-layer Rust loop cannot express.
"""

from mistralrs_tpu.models.config import ModelConfig, config_from_hf
from mistralrs_tpu.models.decoder import DecoderParams, decoder_forward, compute_logits
