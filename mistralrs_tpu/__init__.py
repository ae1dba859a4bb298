"""mistralrs_tpu — a TPU-native (JAX/XLA/Pallas/pjit) LLM inference and serving framework.

A from-scratch re-design of the capability set of mistral.rs (the Rust/Candle/CUDA
reference engine) for TPU hardware:

- continuous-batching engine with an OpenAI-compatible HTTP server
- GGUF k-quant / GPTQ / HQQ quantized inference with fused Pallas dequant-GEMMs
- in-situ quantization (ISQ) with per-layer topology
- paged KV cache with a Pallas block-table attention kernel
- prefix caching, LoRA/X-LoRA, speculative decoding, AnyMoE, vision models,
  grammar-constrained decoding, tool calling
- SPMD sharding (TP/EP/DP) over a `jax.sharding.Mesh` instead of the reference's
  per-layer device mapping

Layering (mirrors the reference's crate layering, SURVEY.md §1):

    server/   HTTP + CLI frontends            (ref: mistralrs-server)
    api.py    Python user API                 (ref: mistralrs-pyo3 Runner)
    engine/   engine, schedulers, sequences   (ref: mistralrs-core runtime)
    pipeline/ model-facing pipeline contract  (ref: mistralrs-core pipeline/)
    models/   decoder architectures           (ref: mistralrs-core models/)
    quant/    quantized linear zoo, ISQ       (ref: mistralrs-quant)
    ops/      Pallas kernels + jnp references (ref: CUDA kernel crates)
    parallel/ mesh + sharding rules           (new: no reference equivalent)
"""

__version__ = "0.1.0"
