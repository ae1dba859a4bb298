"""AnyMoE: build an MoE from dense experts + train the gate (ref examples anymoe)."""
import sys

from mistralrs_tpu.toml_selector import runner_from_toml

# selector.toml:
#   [model]
#   model_id = "<base dir>"
#   [anymoe]
#   dataset_json = "amoe.json"     # [{"prompt": ..., "expert": 0|1}, ...]
#   model_ids = ["<expert dir>"]
#   [anymoe.config]
#   epochs = 50
#   gate_model_id = "saved_gate"
runner = runner_from_toml(sys.argv[1])
from mistralrs_tpu.engine.sampler import SamplingParams
print(runner.send_completion_request("Hello", SamplingParams(max_len=32)).choices[0].text)
