"""TPU compute ops: jnp reference implementations + Pallas kernels.

Every CUDA/native kernel in the reference maps to an op here (SURVEY.md §2):

- paged attention (vLLM CUDA kernels)      -> ops.paged_attention (Pallas block-table kernel)
- flash/cublasLt fused attention           -> ops.flash_attention (Pallas) / ops.attention (jnp)
- GGUF k-quant dequant matmul              -> ops.gguf_dequant (+ quant/ formats)
- GPTQ q_gemm.cu / HQQ dequant             -> ops.int_dequant
- nonzero/bitwise/topk custom ops          -> jnp natives (jnp.nonzero under jit is replaced
                                              by mask-based formulations; XLA has top_k)

Ops accept/return plain jnp arrays, are shape-static, and are safe under jit.
Each op has a pure-jnp reference implementation (used on CPU in tests) and,
where profitable, a Pallas TPU kernel selected at call time.
"""

from mistralrs_tpu.ops.layers import rms_norm, gelu_tanh, silu, swiglu, geglu
from mistralrs_tpu.ops.rope import RopeTable, compute_rope_table, apply_rope
from mistralrs_tpu.ops.attention import sdpa, gqa_attention
