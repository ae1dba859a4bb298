"""AnyMoE with LoRA-adapter experts (ref anymoe_lora.py): each expert is a
PEFT adapter delta over the shared base MLP instead of a full fine-tune
(AnyMoeExpertType::LoraAdapter, amoe/mod.rs:134)."""
import sys

from mistralrs_tpu.toml_selector import runner_from_toml
from mistralrs_tpu.engine.sampler import SamplingParams

# usage: anymoe_lora.py <base_model_dir> <dataset.json> <adapter_dir>...
toml = f"""
[model]
model_id = "{sys.argv[1]}"

[anymoe]
dataset_json = "{sys.argv[2]}"
model_ids = {list(sys.argv[3:])}

[anymoe.config]
expert_type = "lora_adapter"
epochs = 50
"""
runner = runner_from_toml(toml, is_file=False)
print(runner.send_chat_completion_request(
    [{"role": "user", "content": "Explain catalysis."}], SamplingParams(max_len=64),
).choices[0].text)
runner.shutdown()
