"""In-situ quantization at load (ref examples isq)."""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams

runner = Runner(sys.argv[1], isq="Q4K")  # or Q8_0/Q2K/.../HQQ4
print(runner.send_completion_request("Hello", SamplingParams(max_len=32)).choices[0].text)
