"""Phi-3-vision with a local image path (ref phi3v_local_img.py): file://
and plain paths load without base64 round-tripping."""
import sys

from mistralrs_tpu.api import VisionRunner
from mistralrs_tpu.engine.sampler import SamplingParams

runner = VisionRunner(sys.argv[1], "phi3v")
resp = runner.send_chat_completion_request(
    [{"role": "user", "content": [
        {"type": "image_url", "image_url": {"url": f"file://{sys.argv[2]}"}},
        {"type": "text", "text": "Describe the image."},
    ]}],
    SamplingParams(max_len=128),
)
print(resp.choices[0].text)
runner.shutdown()
