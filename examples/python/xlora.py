"""X-LoRA: classifier-mixed adapters (ref examples xlora)."""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams

runner = Runner(sys.argv[1], adapters=sys.argv[3:], ordering=sys.argv[2],
                xlora_path=sys.argv[1])
print(runner.send_completion_request("Hello", SamplingParams(max_len=32)).choices[0].text)
