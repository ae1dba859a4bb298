"""Speculative decoding: GGUF draft + full target (ref examples speculative)."""
import sys

import jax.numpy as jnp

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.loader import load_hf_model
from mistralrs_tpu.pipeline.gguf import load_gguf_model
from mistralrs_tpu.pipeline.speculative import SpeculativePipeline
from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline
from mistralrs_tpu.utils.tokenizer import TokenizerWrapper

target_dir, draft_gguf = sys.argv[1], sys.argv[2]
pc = PipelineConfig()
cfg, params, rope = load_hf_model(target_dir)
dcfg, dparams, drope, _ = load_gguf_model([draft_gguf])
tok = TokenizerWrapper.from_hf_dir(target_dir)
# spec_rounds > 1: greedy rounds run the ON-DEVICE loop (draft steps +
# verify + acceptance inside one jitted scan; docs/SPECULATIVE.md) — the
# r5 single-stream numbers (137 tok/s vs 59 plain on v5e) come from it
pipe = SpeculativePipeline(TextPipeline(cfg, params, rope, pc),
                           TextPipeline(dcfg, dparams, drope, pc), gamma=4,
                           spec_rounds=13)
eng = Engine(pipe, eos_token_ids=tok.eos_token_ids, detokenizer=tok.detokenizer())
runner = Runner.from_engine(eng, tok)
print(runner.send_completion_request("Once upon a time",
                                     SamplingParams(max_len=64)).choices[0].text)
