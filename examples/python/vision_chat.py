"""Vision chat with llava/llava_next/idefics2/phi3v (ref examples phi3v/llava)."""
import base64
import sys

from mistralrs_tpu.api import VisionRunner
from mistralrs_tpu.engine.sampler import SamplingParams

runner = VisionRunner(sys.argv[1], sys.argv[2])  # dir, arch
data = base64.b64encode(open(sys.argv[3], "rb").read()).decode()
resp = runner.send_chat_completion_request(
    [{"role": "user", "content": [
        {"type": "image_url", "image_url": {"url": f"data:image/png;base64,{data}"}},
        {"type": "text", "text": "Describe this image."},
    ]}],
    SamplingParams(max_len=128),
)
print(resp.choices[0].text)
