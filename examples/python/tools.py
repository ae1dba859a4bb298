"""Tool calling (ref examples tools)."""
import json
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.tools import ToolCallingMatcher, ToolChoice

runner = Runner(sys.argv[1])
resp = runner.send_chat_completion_request(
    [{"role": "user",
      "content": 'Call get_weather for Paris. Reply as {"name": ..., "parameters": ...}'}],
    SamplingParams(max_len=96, temperature=0.2),
)
calls = ToolCallingMatcher(ToolChoice("auto")).get_calls(resp.choices[0].text)
for c in calls:
    print(c.name, json.loads(c.arguments))
