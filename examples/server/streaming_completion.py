"""SSE streaming on the legacy completions route (ref streaming_completion.py)."""
import json
import sys
import urllib.request

port = sys.argv[1] if len(sys.argv) > 1 else 1234
req = urllib.request.Request(
    f"http://localhost:{port}/v1/completions",
    data=json.dumps({
        "model": "default",
        "prompt": "Once upon a time",
        "max_tokens": 64,
        "stream": True,
    }).encode(),
    headers={"Content-Type": "application/json"},
)
with urllib.request.urlopen(req) as r:
    for raw in r:
        line = raw.decode().strip()
        if not line.startswith("data:"):
            continue
        payload = line[len("data:"):].strip()
        if payload == "[DONE]":
            break
        print(json.loads(payload)["choices"][0].get("text", ""), end="", flush=True)
print()
