"""Streaming chat deltas (ref examples/python/streaming.py)."""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams

runner = Runner(sys.argv[1])
for delta, reason in runner.stream_chat_completion_request(
    [{"role": "user", "content": "Count to twenty."}],
    SamplingParams(max_len=128),
):
    print(delta, end="", flush=True)
    if reason is not None:
        print(f"\n[finish: {reason}]")
runner.shutdown()
