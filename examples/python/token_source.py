"""Hub auth token sources (ref examples/python/token_source.py).

TokenSource string formats (utils/hub.py parse_token_source):
  literal:<token> | env:<VAR> | path:<file> | cache | none
"""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams

# e.g. python token_source.py mistralai/Mistral-7B-Instruct-v0.1 env:HF_TOKEN
runner = Runner(sys.argv[1], token_source=sys.argv[2] if len(sys.argv) > 2 else "cache")
print(runner.send_chat_completion_request(
    [{"role": "user", "content": "Hello!"}], SamplingParams(max_len=32),
).choices[0].text)
runner.shutdown()
