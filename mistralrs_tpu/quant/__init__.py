"""Quantized linear layer zoo.

Reference parity: mistralrs-quant (`QuantMethod` trait, lib.rs:139-174) — the
per-layer polymorphic matmul abstraction behind GGUF k-quants, GPTQ, HQQ and
unquantized linears, plus ISQ (in-situ quantization).

TPU design: a `Linear` is a pytree dataclass whose *kind* is static aux data,
so a model whose layers share a kind stacks/scans cleanly under jit, and the
forward dispatches (at trace time, zero runtime cost) to either a plain
bf16 MXU matmul or a Pallas dequant-GEMM that unpacks the integer blocks in
VMEM and never materializes dequantized weights in HBM.
"""

from mistralrs_tpu.quant.qlinear import Linear, linear, make_dense, register_kind
