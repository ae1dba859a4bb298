"""SPMD sharding over a jax device mesh.

No reference equivalent: the reference's only multi-device story is per-layer
device mapping with activation hops (mistralrs-core/src/device_map.rs:39-127).
Here parallelism is GSPMD: weights/KV get PartitionSpecs over a named mesh
("dp", "tp") and XLA inserts the collectives over ICI (SURVEY.md §2.4).

Scheme (megatron-style, adapted to the stacked-layer layout):
- attention q/k/v + mlp gate/up: column-parallel   (in, out) -> P(None, "tp")
- attention o + mlp down:        row-parallel      (in, out) -> P("tp", None)
  (XLA inserts the psum after the row-parallel matmul)
- embed / lm_head: vocab-parallel                  (V, E)    -> P("tp", None)
- KV pages: head-parallel [L, P, page, Hkv, D]               -> P on Hkv
- MoE experts: expert-parallel leading axis        [E, ...]  -> P("tp", ...)
- norms, rope tables: replicated
- decode/prefill batch rows: data-parallel over "dp"
"""

from mistralrs_tpu.parallel.mesh import make_mesh, shard_params, shard_cache, param_specs
from mistralrs_tpu.parallel.pipeline_parallel import make_pp_mesh, pp_decoder_forward
