"""On-chip end-to-end server smoke: tiny HF checkpoint with ISQ Q4_K,
served by the OpenAI HTTP server ON THE REAL TPU, driven with a chat
completion + SSE stream. Validates the full user path (CLI boot ->
engine -> stacked kernels on real Mosaic -> HTTP) at final r4 state."""
import json, os, sys, tempfile, time, urllib.request
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, torch
import transformers as tf

torch.manual_seed(3)
d = tempfile.mkdtemp() + "/model"
hf_cfg = tf.LlamaConfig(hidden_size=256, intermediate_size=512,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, vocab_size=128,
                        max_position_embeddings=256, head_dim=64)
tf.LlamaForCausalLM(hf_cfg).save_pretrained(d, safe_serialization=True)
from tokenizers import Tokenizer, models, pre_tokenizers
tok = Tokenizer(models.WordLevel({f"w{i}": i for i in range(128)}, unk_token="w0"))
tok.pre_tokenizer = pre_tokenizers.Whitespace()
tok.save(d + "/tokenizer.json")
open(d + "/tokenizer_config.json", "w").write("{}")

import subprocess

port = 8399
env = dict(os.environ, MISTRALRS_COMPILE_CACHE="/tmp/mistralrs_xla_cache",
           PYTHONPATH=os.path.join(os.path.dirname(__file__), "..") + ":" + os.environ.get("PYTHONPATH", ""))
proc = subprocess.Popen(
    [sys.executable, "-m", "mistralrs_tpu.server.cli",
     "--port", str(port), "--chat-template", "chatml",
     "--compilation-cache-dir", "/tmp/mistralrs_xla_cache",
     "plain", "--model", d, "--isq", "Q4K", "--dtype", "bf16"],
    env=env, stdout=open("/tmp/server_proc.log", "w"),
    stderr=subprocess.STDOUT, cwd=os.path.join(os.path.dirname(__file__), ".."))
import atexit
atexit.register(proc.kill)
deadline = time.time() + 600
while time.time() < deadline:
    try:
        r = urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=5)
        if r.status == 200:
            break
    except Exception:
        time.sleep(2)
else:
    print("FAIL: server never became healthy"); sys.exit(1)
print("server healthy on real TPU", flush=True)

body = json.dumps({
    "model": "default",
    "messages": [{"role": "user", "content": "w1 w2 w3"}],
    "max_tokens": 8, "temperature": 0.0,
}).encode()
req = urllib.request.Request(
    f"http://127.0.0.1:{port}/v1/chat/completions", data=body,
    headers={"Content-Type": "application/json"})
resp = json.load(urllib.request.urlopen(req, timeout=300))
assert resp["choices"][0]["message"]["content"], resp
assert resp["usage"]["completion_tokens"] >= 1, resp
print("chat completion OK:", json.dumps(resp["choices"][0]["message"])[:90], flush=True)

body = json.dumps({
    "model": "default",
    "messages": [{"role": "user", "content": "w4 w5"}],
    "max_tokens": 6, "stream": True,
}).encode()
req = urllib.request.Request(
    f"http://127.0.0.1:{port}/v1/chat/completions", data=body,
    headers={"Content-Type": "application/json"})
chunks = 0
with urllib.request.urlopen(req, timeout=300) as r:
    for line in r:
        if line.startswith(b"data: ") and b"[DONE]" not in line:
            chunks += 1
assert chunks >= 2, chunks
print(f"SSE stream OK ({chunks} chunks). ON-CHIP SERVER SMOKE PASSED", flush=True)
