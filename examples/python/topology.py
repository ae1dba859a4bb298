"""Per-layer ISQ topology YAML (ref examples topology)."""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams

# topology.yml:
#   0-8:
#     isq: Q3K
#   8-32:
#     isq: Q4K
runner = Runner(sys.argv[1], topology=sys.argv[2])
print(runner.send_completion_request("Hi", SamplingParams(max_len=16)).choices[0].text)
