"""HTTP request with a regex grammar constraint."""
import json
import sys
import urllib.request

req = urllib.request.Request(
    "http://localhost:1234/v1/completions",
    data=json.dumps({
        "model": "default", "prompt": "A phone number: ", "max_tokens": 20,
        "temperature": 0.7,
        "grammar": {"type": "regex", "value": r"\(\d{3}\) \d{3}-\d{4}"},
    }).encode(),
    headers={"Content-Type": "application/json"},
)
print(json.load(urllib.request.urlopen(req))["choices"][0]["text"])
