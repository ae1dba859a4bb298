"""Legacy /v1/completions request, incl. best_of (ref examples/server/completion.py)."""
import json
import sys
import urllib.request

port = sys.argv[1] if len(sys.argv) > 1 else 1234
req = urllib.request.Request(
    f"http://localhost:{port}/v1/completions",
    data=json.dumps({
        "model": "default",
        "prompt": "The capital of France is",
        "max_tokens": 32,
        "temperature": 0.7,
        "best_of": 3,   # sample 3 candidates server-side, return the best
        "n": 1,
    }).encode(),
    headers={"Content-Type": "application/json"},
)
print(json.load(urllib.request.urlopen(req))["choices"][0]["text"])
