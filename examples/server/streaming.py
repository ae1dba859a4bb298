"""SSE streaming chat (ref examples/server/streaming.py)."""
import json
import sys
import urllib.request

port = sys.argv[1] if len(sys.argv) > 1 else 1234
req = urllib.request.Request(
    f"http://localhost:{port}/v1/chat/completions",
    data=json.dumps({
        "model": "default",
        "messages": [{"role": "user", "content": "Tell me a joke."}],
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
        delta = json.loads(payload)["choices"][0]["delta"]
        print(delta.get("content", ""), end="", flush=True)
print()
