"""Plain text model chat (ref mistralrs/examples/simple + examples/python)."""
import sys

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.sampler import SamplingParams

runner = Runner(sys.argv[1])
resp = runner.send_chat_completion_request(
    [{"role": "user", "content": "Tell me a story about the sea."}],
    SamplingParams(max_len=256, temperature=0.7, top_p=0.9),
)
print(resp.choices[0].text)
print(resp.usage)
runner.shutdown()
