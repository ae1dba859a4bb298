"""Configure the paged KV cache explicitly (ref examples/python/paged_attention.py)."""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.pipeline.text import PipelineConfig

runner = Runner(
    sys.argv[1],
    pipeline_config=PipelineConfig(
        page_size=16,          # tokens per KV page (ref block_size)
        kv_mem_fraction=0.8,   # fraction of free HBM for pages (ref MemoryGpuConfig)
        max_seqs=32,
        max_model_len=8192,
    ),
)
print(runner.send_chat_completion_request(
    [{"role": "user", "content": "Hello!"}], SamplingParams(max_len=32),
).choices[0].text)
runner.shutdown()
