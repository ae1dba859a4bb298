"""LLaVA-NeXT (1.6) vision chat with anyres tiling (ref llava_next.py)."""
import base64
import sys

from mistralrs_tpu.api import VisionRunner
from mistralrs_tpu.engine.sampler import SamplingParams

runner = VisionRunner(sys.argv[1], "llava_next")
data = base64.b64encode(open(sys.argv[2], "rb").read()).decode()
resp = runner.send_chat_completion_request(
    [{"role": "user", "content": [
        {"type": "image_url", "image_url": {"url": f"data:image/png;base64,{data}"}},
        {"type": "text", "text": "Describe this image in detail."},
    ]}],
    SamplingParams(max_len=256),
)
print(resp.choices[0].text)
runner.shutdown()
