"""Serve a local GGUF file (ref examples gguf_locally)."""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.pipeline.gguf import load_gguf_model

cfg, params, rope, tokenizer = load_gguf_model(sys.argv[1:])
runner = Runner.from_parts(cfg, params, rope, tokenizer)
print(runner.send_completion_request("The capital of France is",
                                     SamplingParams(max_len=16)).choices[0].text)
