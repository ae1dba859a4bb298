"""Runtime adapter activation over HTTP (ref examples/server/adapter_chat.py):
swap the active LoRA adapter between requests via /activate_adapters."""
import json
import sys
import urllib.request

port = sys.argv[1] if len(sys.argv) > 1 else 1234
base = f"http://localhost:{port}"

def post(path, body):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return json.load(urllib.request.urlopen(req))

for adapter in sys.argv[2:]:
    post("/activate_adapters", {"adapter_names": [adapter]})
    out = post("/v1/chat/completions", {
        "model": "default",
        "messages": [{"role": "user", "content": "Who are you?"}],
        "max_tokens": 48,
    })
    print(f"[{adapter}] {out['choices'][0]['message']['content']}")
