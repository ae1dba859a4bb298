"""Prompt-lookup (n-gram) speculative decoding: no draft model at all.

Proposals come from the sequence's own recent tokens (longest n-gram
suffix match); greedy output is token-identical to plain decoding, and
repetitive-content workloads (extraction, code edits, quotes) accept long
spans. spec_rounds > 1 runs the whole loop on-device (docs/SPECULATIVE.md);
`--prompt-lookup-gamma` enables the same thing on the server CLI.
"""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.loader import load_hf_model
from mistralrs_tpu.pipeline.speculative import PromptLookupPipeline
from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline
from mistralrs_tpu.utils.tokenizer import TokenizerWrapper

model_dir = sys.argv[1]
cfg, params, rope = load_hf_model(model_dir, isq="Q4K")
tok = TokenizerWrapper.from_hf_dir(model_dir)
pipe = PromptLookupPipeline(
    TextPipeline(cfg, params, rope, PipelineConfig()),
    gamma=3, spec_rounds=16)
eng = Engine(pipe, eos_token_ids=tok.eos_token_ids,
             detokenizer=tok.detokenizer())
runner = Runner.from_engine(eng, tok)
doc = "The quick brown fox jumps over the lazy dog. " * 8
out = runner.send_completion_request(
    f"Repeat this paragraph exactly:\n{doc}\n", SamplingParams(max_len=96))
print(out.choices[0].text)
