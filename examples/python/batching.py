"""Concurrent requests share the continuous batch (ref examples batching)."""
import sys
import threading

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams

runner = Runner(sys.argv[1])
prompts = ["Write a haiku.", "Name three fruits.", "What is 2+2?"]
out = [None] * len(prompts)

def go(i):
    out[i] = runner.send_completion_request(prompts[i], SamplingParams(max_len=48))

threads = [threading.Thread(target=go, args=(i,)) for i in range(len(prompts))]
[t.start() for t in threads]
[t.join() for t in threads]
for p, r in zip(prompts, out):
    print(p, "->", r.choices[0].text)
