"""Regex-constrained decoding (ref examples/server/regex.py): grammar
constraints force the output to match the pattern exactly."""
import json
import sys
import urllib.request

port = sys.argv[1] if len(sys.argv) > 1 else 1234
req = urllib.request.Request(
    f"http://localhost:{port}/v1/chat/completions",
    data=json.dumps({
        "model": "default",
        "messages": [{"role": "user", "content": "Give me an RGB color."}],
        "max_tokens": 24,
        "grammar": {"type": "regex",
                    "value": r"#[0-9a-fA-F]{6}"},
    }).encode(),
    headers={"Content-Type": "application/json"},
)
print(json.load(urllib.request.urlopen(req))["choices"][0]["message"]["content"])
