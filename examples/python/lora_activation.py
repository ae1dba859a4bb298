"""LoRA adapters with runtime activation (ref examples lora_activation)."""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams

runner = Runner(sys.argv[1], adapters=[sys.argv[2]])
sp = SamplingParams(max_len=64)
print("adapter on :", runner.send_completion_request("Hello", sp).choices[0].text)
runner.activate_adapters([])  # base model
print("adapter off:", runner.send_completion_request("Hello", sp).choices[0].text)
