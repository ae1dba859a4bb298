"""Custom logits processors (ref examples custom_logits_processor)."""
import sys

import numpy as np

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams

def no_vowels(logits: np.ndarray, context) -> np.ndarray:
    logits = logits.copy()
    logits[[65, 69, 73, 79, 85]] = -np.inf  # ban some token ids
    return logits

runner = Runner(sys.argv[1])
resp = runner.send_completion_request(
    "Hello", SamplingParams(max_len=32, temperature=0.7, logits_processors=[no_vowels]))
print(resp.choices[0].text)
