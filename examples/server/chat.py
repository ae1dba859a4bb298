"""OpenAI-client-style HTTP chat (ref examples/server)."""
import json
import sys
import urllib.request

req = urllib.request.Request(
    f"http://localhost:{sys.argv[1] if len(sys.argv) > 1 else 1234}/v1/chat/completions",
    data=json.dumps({
        "model": "default",
        "messages": [{"role": "user", "content": "Hello!"}],
        "max_tokens": 64,
    }).encode(),
    headers={"Content-Type": "application/json"},
)
print(json.load(urllib.request.urlopen(req))["choices"][0]["message"]["content"])
