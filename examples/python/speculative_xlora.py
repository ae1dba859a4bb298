"""Speculative decoding with an X-LoRA target model (ref speculative_xlora.py):
draft proposes gamma tokens, the X-LoRA dual-pass target verifies."""
import sys

from mistralrs_tpu.toml_selector import runner_from_toml
from mistralrs_tpu.engine.sampler import SamplingParams

# usage: speculative_xlora.py <xlora_model_dir> <draft_model_dir>
toml = f"""
[model]
model_id = "{sys.argv[1]}"
xlora_model_id = "{sys.argv[1]}"

[speculative]
gamma = 16

[speculative.draft_model]
model_id = "{sys.argv[2]}"
"""
runner = runner_from_toml(toml, is_file=False)
print(runner.send_chat_completion_request(
    [{"role": "user", "content": "Summarize the theory of evolution."}],
    SamplingParams(max_len=64),
).choices[0].text)
runner.shutdown()
