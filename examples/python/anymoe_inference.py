"""Serve an AnyMoE model with pre-trained gates (ref anymoe_inference.py).

Expects gates already trained (see anymoe.py) and saved via save_gates to
<gate_dir>/gate.safetensors.
"""
import sys

from mistralrs_tpu.toml_selector import runner_from_toml
from mistralrs_tpu.engine.sampler import SamplingParams

toml = f"""
[model]
model_id = "{sys.argv[1]}"

[anymoe]
model_ids = {list(sys.argv[3:])}

[anymoe.config]
gate_model_id = "{sys.argv[2]}"
"""
runner = runner_from_toml(toml, is_file=False)
print(runner.send_chat_completion_request(
    [{"role": "user", "content": "What is graphene?"}], SamplingParams(max_len=64),
).choices[0].text)
runner.shutdown()
