"""Token-rate micro-bench over the HTTP streaming route
(ref examples/server/stream_completion_bench.py)."""
import json
import sys
import time
import urllib.request

port = sys.argv[1] if len(sys.argv) > 1 else 1234
req = urllib.request.Request(
    f"http://localhost:{port}/v1/completions",
    data=json.dumps({
        "model": "default", "prompt": "Hello ", "max_tokens": 256,
        "stream": True,
    }).encode(),
    headers={"Content-Type": "application/json"},
)
t0 = time.time()
first = None
n = 0
with urllib.request.urlopen(req) as r:
    for raw in r:
        line = raw.decode().strip()
        if not line.startswith("data:") or line.endswith("[DONE]"):
            continue
        if first is None:
            first = time.time()
        n += 1
dt = time.time() - (first or t0)
print(f"TTFT {((first or t0) - t0) * 1e3:.0f} ms, "
      f"{n} chunks in {dt:.2f}s ({n / max(dt, 1e-9):.1f} chunks/s)")
