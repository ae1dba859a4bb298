"""Long-context generation: chunked prefill streams the prompt through
power-of-two buckets; past 4k of context the blockwise online-softmax path
keeps attention memory flat, and sliding-window models additionally release
KV pages behind the window while decoding."""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.pipeline.text import PipelineConfig

runner = Runner(
    sys.argv[1],
    pipeline_config=PipelineConfig(
        max_model_len=32768,
        num_pages=None,  # auto-size the KV pool from free HBM
        prefill_buckets=(512, 2048),
    ),
)
long_doc = open(sys.argv[2]).read()
r = runner.send_chat_completion_request(
    [{"role": "user", "content": f"{long_doc}\n\nSummarize the above."}],
    SamplingParams(max_len=256),
)
print(r.choices[0].text)
