"""OpenAI HTTP server tests over a fake-pipeline engine (no device work)."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from mistralrs_tpu.api import Runner
from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.server.openai import OpenAIServer

from test_engine import FakePC, FakePipeline


class FakeTokenizer:
    """chr-level tokenizer: token = ord(char) % 50."""

    chat_template = (
        "{% for m in messages %}{{ m['role'] }}:{{ m['content'] }}|{% endfor %}"
        "{% if add_generation_prompt %}assistant:{% endif %}"
    )
    bos_token = "<s>"
    eos_token = "</s>"
    eos_token_ids = {49}

    def encode(self, text, add_special_tokens=True):
        return [ord(c) % 50 for c in text][:30]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(65 + t % 26) for t in ids)

    def detokenizer(self):
        return lambda ids: self.decode(ids)


def make_runner():
    tok = FakeTokenizer()
    eng = Engine(
        FakePipeline(FakePC(max_model_len=128, num_pages=64)),
        eos_token_ids=tok.eos_token_ids,
        detokenizer=tok.detokenizer(),
    )
    return Runner.from_engine(eng, tok)


@pytest.fixture
def client_and_runner():
    runner = make_runner()
    server = OpenAIServer(runner, model_id="fake-model")

    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(server.app(), loop=loop,
                                   handler_cancellation=True), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, runner, loop
    loop.run_until_complete(client.close())
    runner.shutdown()
    loop.close()


def _run(loop, coro):
    return loop.run_until_complete(coro)


def test_health_and_models(client_and_runner):
    client, _, loop = client_and_runner

    async def go():
        r = await client.get("/health")
        assert r.status == 200 and await r.text() == "OK"
        r = await client.get("/v1/models")
        data = await r.json()
        assert data["data"][0]["id"] == "fake-model"

    _run(loop, go())


def test_chat_completion_blocking(client_and_runner):
    client, _, loop = client_and_runner

    async def go():
        r = await client.post(
            "/v1/chat/completions",
            json={
                "model": "fake-model",
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 5,
            },
        )
        assert r.status == 200
        data = await r.json()
        assert data["object"] == "chat.completion"
        assert len(data["choices"]) == 1
        assert data["choices"][0]["message"]["role"] == "assistant"
        assert data["choices"][0]["finish_reason"] in ("length", "stop")
        assert data["usage"]["completion_tokens"] == 5
        assert data["usage"]["prompt_tokens"] > 0

    _run(loop, go())


def test_completions_endpoint(client_and_runner):
    client, _, loop = client_and_runner

    async def go():
        r = await client.post(
            "/v1/completions",
            json={"model": "fake-model", "prompt": "abc", "max_tokens": 4},
        )
        data = await r.json()
        assert data["object"] == "text_completion"
        assert isinstance(data["choices"][0]["text"], str)

    _run(loop, go())


def test_chat_completion_streaming(client_and_runner):
    client, _, loop = client_and_runner

    async def go():
        r = await client.post(
            "/v1/chat/completions",
            json={
                "model": "fake-model",
                "messages": [{"role": "user", "content": "stream please"}],
                "max_tokens": 6,
                "stream": True,
            },
        )
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/event-stream")
        body = await r.text()
        events = [l[6:] for l in body.splitlines() if l.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        assert all(c["object"] == "chat.completion.chunk" for c in chunks)
        text = "".join(c["choices"][0]["delta"].get("content", "") for c in chunks)
        assert len(text) > 0
        assert chunks[-1]["choices"][0]["finish_reason"] in ("length", "stop")

    _run(loop, go())


def test_malformed_request_400(client_and_runner):
    client, _, loop = client_and_runner

    async def go():
        r = await client.post("/v1/chat/completions", json={"model": "x"})  # no messages
        assert r.status == 400
        data = await r.json()
        assert "error" in data

    _run(loop, go())


def test_n_choices(client_and_runner):
    client, _, loop = client_and_runner

    async def go():
        r = await client.post(
            "/v1/chat/completions",
            json={
                "model": "fake-model",
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 3,
                "n": 2,
            },
        )
        data = await r.json()
        assert len(data["choices"]) == 2

    _run(loop, go())


def test_stop_string(client_and_runner):
    client, _, loop = client_and_runner

    async def go():
        # fake model cycles tokens -> text cycles chars; use a char we will hit
        r = await client.post(
            "/v1/chat/completions",
            json={
                "model": "fake-model",
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 30,
                "stop": [chr(65 + 10)],
            },
        )
        data = await r.json()
        assert data["choices"][0]["finish_reason"] == "stop"
        assert chr(65 + 10) not in data["choices"][0]["message"]["content"]

    _run(loop, go())


def test_completions_logprobs(client_and_runner):
    """OpenAI logprobs=true returns per-token logprob content."""
    client, _, loop = client_and_runner

    async def go():
        resp = await client.post("/v1/completions", json={
            "model": "fake-model", "prompt": "abc", "max_tokens": 3,
            "logprobs": True, "top_logprobs": 2, "temperature": 0.7,
        })
        body = await resp.json()
        assert resp.status == 200, body
        lp = body["choices"][0]["logprobs"]
        assert lp and len(lp["content"]) == 3
        assert len(lp["content"][0]["top_logprobs"]) == 2

    _run(loop, go())


def test_metrics_endpoint(client_and_runner):
    client, _, loop = client_and_runner

    async def go():
        r = await client.get("/metrics")
        assert r.status == 200
        text = await r.text()
        assert "mistralrs_kv_pages_free" in text
        assert "mistralrs_requests_running 0" in text

    _run(loop, go())


def test_aux_routes(client_and_runner):
    """/re_isq, /activate_adapters, /docs, /docs/openapi.json surface
    behavior (ref mistralrs-server routes main.rs:246-258)."""
    client, runner, loop = client_and_runner

    async def go():
        # fake pipeline has no re_isq / adapters -> clean 400s
        r = await client.post("/re_isq", json={"ggml_type": "Q4K"})
        assert r.status == 400
        r = await client.post("/activate_adapters", json={"adapter_names": ["a"]})
        assert r.status == 400
        # wire in fakes -> 200s
        called = {}
        runner.handle.engine.pipeline.re_isq = lambda t: called.setdefault("isq", t)
        runner.activate_adapters = lambda names: called.setdefault("act", names)
        r = await client.post("/re_isq", json={"ggml_type": "Q4K"})
        assert r.status == 200 and called["isq"] == "Q4K"
        r = await client.post("/activate_adapters", json={"adapter_names": ["a"]})
        assert r.status == 200 and called["act"] == ["a"]
        r = await client.get("/docs")
        assert r.status == 200 and "OpenAI-compatible" in await r.text()
        r = await client.get("/docs/openapi.json")
        assert r.status == 200 and "openapi" in (await r.json())

    _run(loop, go())


def test_streaming_client_disconnect_cancels(client_and_runner):
    """Dead-receiver parity (sampling.rs:86-97): when writing an SSE chunk
    to the client fails (receiver gone), the server cancels the generation
    (write-failure injection; real-socket disconnects additionally cancel
    the handler task via run_app(handler_cancellation=True))."""
    import time as _t

    from aiohttp import web as _web

    client, runner, loop = client_and_runner
    eng = runner.handle.engine
    # throttle the fake model so generation outlives the failed write
    orig_decode = eng.pipeline.run_decode

    def slow_decode(*a, **k):
        _t.sleep(0.05)
        return orig_decode(*a, **k)

    eng.pipeline.run_decode = slow_decode

    orig_write = _web.StreamResponse.write
    calls = {"n": 0}

    async def flaky_write(self, data):
        if b"data:" in bytes(data):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise ConnectionResetError("client vanished")
        return await orig_write(self, data)

    _web.StreamResponse.write = flaky_write
    try:
        async def go():
            resp = await client.post(
                "/v1/chat/completions",
                json={"model": "fake-model",
                      "messages": [{"role": "user", "content": "hi"}],
                      "max_tokens": 1000, "stream": True},
            )
            await resp.content.read()
            resp.close()

        _run(loop, go())
        deadline = _t.time() + 20
        while _t.time() < deadline:
            groups = list(eng._groups.values())
            if groups and all(g.all_done() for g in groups):
                break
            if eng.has_work:
                pass
            _t.sleep(0.05)
    finally:
        _web.StreamResponse.write = orig_write
        eng.pipeline.run_decode = orig_decode
    groups = list(eng._groups.values())
    assert groups and all(g.all_done() for g in groups)
    reasons = [s.output().finish_reason for g in groups for s in g.seqs]
    assert "canceled" in reasons, reasons


def test_completions_best_of(client_and_runner):
    """best_of samples extra candidates server-side and returns the n best
    by mean logprob (ref request.rs:31, sequence.rs get_completion_choices)."""
    client, _, loop = client_and_runner

    async def go():
        r = await client.post(
            "/v1/completions",
            json={"model": "fake-model", "prompt": "abc", "max_tokens": 4,
                  "best_of": 3, "n": 2, "temperature": 1.0, "seed": 7},
        )
        assert r.status == 200
        data = await r.json()
        assert len(data["choices"]) == 2
        assert [c["index"] for c in data["choices"]] == [0, 1]
        # usage counts ALL sampled candidates (3 streams of 4 tokens)
        assert data["usage"]["completion_tokens"] == 12

        # best_of < n is invalid
        r = await client.post(
            "/v1/completions",
            json={"model": "fake-model", "prompt": "abc", "max_tokens": 4,
                  "best_of": 1, "n": 2},
        )
        assert r.status == 400

        # best_of > n cannot stream
        r = await client.post(
            "/v1/completions",
            json={"model": "fake-model", "prompt": "abc", "max_tokens": 4,
                  "best_of": 2, "n": 1, "stream": True},
        )
        assert r.status == 400

    _run(loop, go())


def test_completions_token_prompt_echo_and_int_logprobs(client_and_runner):
    """Legacy-route parity: prompt as raw token ids (ref
    RequestMessage::CompletionTokens), echo_prompt prepends the prompt text
    (ref engine/mod.rs:706), and `logprobs` is a top-N int."""
    client, _, loop = client_and_runner

    async def go():
        r = await client.post(
            "/v1/completions",
            json={"model": "fake-model", "prompt": [5, 9, 11], "max_tokens": 3},
        )
        assert r.status == 200
        data = await r.json()
        assert data["usage"]["prompt_tokens"] == 3

        r = await client.post(
            "/v1/completions",
            json={"model": "fake-model", "prompt": "abc", "max_tokens": 3,
                  "echo": True, "logprobs": 2},
        )
        data = await r.json()
        assert data["choices"][0]["text"].startswith("abc")
        lp = data["choices"][0]["logprobs"]
        assert lp and len(lp["content"]) == 3
        assert len(lp["content"][0]["top_logprobs"]) == 2

    _run(loop, go())


def test_request_validation_rejects_hostile_values(client_and_runner):
    """Invalid sampling fields must 400 at parse time — a string max_tokens
    used to reach the engine thread and fail the whole running batch."""
    client, runner, loop = client_and_runner

    def post(body):
        body = {"model": "m",
                "messages": [{"role": "user", "content": "hi"}], **body}
        return loop.run_until_complete(
            client.post("/v1/chat/completions", json=body))

    for body in ({"max_tokens": -5}, {"max_tokens": "ten"},
                 {"max_tokens": 2, "n": 0},
                 {"max_tokens": 2, "temperature": -1.0},
                 {"max_tokens": 2, "top_p": 5.0},
                 {"max_tokens": 2, "temperature": True}):
        resp = post(body)
        assert resp.status == 400, body
    assert post({"max_tokens": 2, "top_k": 10**9}).status == 200
    assert post({"max_completion_tokens": 2}).status == 200
