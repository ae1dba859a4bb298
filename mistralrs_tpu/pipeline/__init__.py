"""Model-facing pipeline layer.

Reference parity: mistralrs-core/src/pipeline/ — the `Pipeline` trait
(mod.rs:204-395) whose `step()` turns scheduled sequences into batched model
calls, the inputs processor (inputs_processor.rs: padded batches, prompt
chunking, paged slot mappings/block tables), and the per-format loaders
(normal.rs / gguf.rs).

TPU design: a pipeline owns the device cache + a small set of *jitted step
functions* keyed by static bucket shapes (decode: fixed slot count; prefill:
power-of-two chunk lengths). Array building from host sequence state happens
here; nothing above this layer touches jax.
"""

from mistralrs_tpu.pipeline.text import TextPipeline
