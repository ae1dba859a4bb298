"""OpenAI-compatible HTTP server (aiohttp).

Reference parity: mistralrs-server — routes (main.rs:246-258), request
parsing incl. grammar constraints and stop sequences
(chat_completion.rs:153-340), SSE streaming with keep-alive (`Streamer`
:43-90), completions endpoint (completions.rs), /health and /v1/models.

The engine runs on its own thread (api.EngineHandle); each HTTP task talks
to it through thread-safe queues bridged into asyncio.
"""

from __future__ import annotations

import asyncio
import dataclasses
import json
import time
import uuid
from typing import Any

from aiohttp import web

from mistralrs_tpu.engine.engine import GenerationRequest
from mistralrs_tpu.engine.sampler import SamplingParams


def _num(body: dict, key: str, lo=None, hi=None, integer=False):
    """Validated numeric request field -> value or None (absent). Raises
    ValueError (-> HTTP 400) instead of letting a hostile value reach the
    engine thread, where a type error would fail the whole running batch."""
    v = body.get(key)
    if v is None:
        return None
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise ValueError(f"{key} must be a number, got {type(v).__name__}")
    if integer:
        if v != int(v):
            raise ValueError(f"{key} must be an integer, got {v}")
        v = int(v)
    if lo is not None and v < lo:
        raise ValueError(f"{key} must be >= {lo}, got {v}")
    if hi is not None and v > hi:
        raise ValueError(f"{key} must be <= {hi}, got {v}")
    return v


def _parse_sampling(body: dict[str, Any]) -> SamplingParams:
    """OpenAI request body -> SamplingParams (ref chat_completion.rs:153-263)."""
    stop = body.get("stop")
    stop_strings: list[str] = []
    if isinstance(stop, str):
        stop_strings = [stop]
    elif isinstance(stop, list):
        stop_strings = [s for s in stop if isinstance(s, str)]
    logit_bias = None
    if body.get("logit_bias"):
        logit_bias = {int(k): float(v) for k, v in body["logit_bias"].items()}
    top_logprobs = _num(body, "top_logprobs", lo=0, hi=64, integer=True) or 0
    if "max_tokens" not in body and "max_completion_tokens" in body:
        body = {**body, "max_tokens": body["max_completion_tokens"]}
    return SamplingParams(
        temperature=_num(body, "temperature", lo=0.0),
        top_k=_num(body, "top_k", lo=1, integer=True),
        top_p=_num(body, "top_p", lo=0.0, hi=1.0),
        min_p=_num(body, "min_p", lo=0.0, hi=1.0),
        top_n_logprobs=top_logprobs,
        frequency_penalty=_num(body, "frequency_penalty", lo=-2.0, hi=2.0),
        presence_penalty=_num(body, "presence_penalty", lo=-2.0, hi=2.0),
        stop_strings=stop_strings,
        max_len=_num(body, "max_tokens", lo=1, integer=True),
        logits_bias=logit_bias,
        n_choices=_num(body, "n", lo=1, integer=True) or 1,
        seed=_num(body, "seed", integer=True),
    )


class OpenAIServer:
    def __init__(self, runner, model_id: str = "default"):
        self.runner = runner  # mistralrs_tpu.api.Runner
        self.model_id = model_id
        self.created = int(time.time())

    # ------------------------------------------------------------- routes
    def app(self) -> web.Application:
        app = web.Application()
        app.router.add_get("/health", self.health)
        app.router.add_get("/v1/models", self.models)
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        app.router.add_post("/v1/completions", self.completions)
        app.router.add_post("/re_isq", self.re_isq)
        app.router.add_post("/activate_adapters", self.activate_adapters)
        app.router.add_get("/metrics", self.metrics)
        app.router.add_get("/docs", self.docs)
        app.router.add_get("/docs/openapi.json", self.openapi)
        return app

    async def openapi(self, request: web.Request) -> web.Response:
        """OpenAPI schema (ref mistralrs-server utoipa ApiDoc main.rs:238-247)."""
        return web.json_response(_openapi_schema(self.model_id))

    async def docs(self, request: web.Request) -> web.Response:
        html = (
            "<!doctype html><html><head><title>mistralrs-tpu API</title></head>"
            "<body><h1>mistralrs-tpu OpenAI-compatible API</h1>"
            "<p>Schema: <a href='/docs/openapi.json'>/docs/openapi.json</a></p>"
            "<ul>"
            "<li>POST /v1/chat/completions — chat (supports stream, grammar, "
            "tools, image_url content parts)</li>"
            "<li>POST /v1/completions — raw completions</li>"
            "<li>GET /v1/models — model list</li>"
            "<li>GET /health — liveness</li>"
            "<li>POST /re_isq — runtime re-quantization</li>"
            "<li>POST /activate_adapters — LoRA adapter swap</li>"
            "</ul></body></html>"
        )
        return web.Response(text=html, content_type="text/html")

    async def health(self, request: web.Request) -> web.Response:
        return web.Response(text="OK")

    async def metrics(self, request: web.Request) -> web.Response:
        """Prometheus-style serving metrics (beyond the reference, which
        exposes none — SURVEY §5 observability row)."""
        eng = self.runner.handle.engine
        sched = eng.scheduler
        bm = eng.block_manager
        running = len(sched.running)
        waiting = len(sched.waiting)
        free = bm.num_free
        total = bm.num_pages - 1  # page 0 reserved
        lines = [
            "# TYPE mistralrs_requests_running gauge",
            f"mistralrs_requests_running {running}",
            "# TYPE mistralrs_requests_waiting gauge",
            f"mistralrs_requests_waiting {waiting}",
            "# TYPE mistralrs_kv_pages_free gauge",
            f"mistralrs_kv_pages_free {free}",
            "# TYPE mistralrs_kv_pages_total gauge",
            f"mistralrs_kv_pages_total {total}",
            "# TYPE mistralrs_kv_page_utilization gauge",
            f"mistralrs_kv_page_utilization {1.0 - free / max(total, 1):.4f}",
        ]
        tp = eng.last_throughput or {}
        if tp:
            lines += [
                "# TYPE mistralrs_prompt_tok_per_s gauge",
                f"mistralrs_prompt_tok_per_s {tp.get('prompt_tok_s', 0.0):.2f}",
                "# TYPE mistralrs_completion_tok_per_s gauge",
                f"mistralrs_completion_tok_per_s {tp.get('completion_tok_s', 0.0):.2f}",
            ]
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": self.model_id,
                        "object": "model",
                        "created": self.created,
                        "owned_by": "local",
                    }
                ],
            }
        )

    async def re_isq(self, request: web.Request) -> web.Response:
        body = await request.json()
        ok = await asyncio.to_thread(self._try_re_isq, body.get("ggml_type", ""))
        if not ok:
            return web.json_response({"error": "re-ISQ unsupported for this model"}, status=400)
        return web.Response(text="ok")

    async def activate_adapters(self, request: web.Request) -> web.Response:
        """Runtime LoRA adapter swap (ref mistralrs-server main.rs:246-258
        /activate_adapters route)."""
        body = await request.json()
        names = body.get("adapter_names", [])
        if not hasattr(self.runner, "activate_adapters"):
            return web.json_response({"error": "model has no adapters"}, status=400)
        try:
            await asyncio.to_thread(self.runner.activate_adapters, names)
        except Exception as e:  # adapterless model / unknown adapter name
            return web.json_response({"error": str(e)}, status=400)
        return web.Response(text="ok")

    def _try_re_isq(self, ggml_type: str) -> bool:
        pipe = self.runner.handle.engine.pipeline
        if not hasattr(pipe, "re_isq"):
            return False
        # params mutate under the step loop: run on the engine thread
        # between steps (ref Request::ReIsq is an engine-loop message)
        self.runner.handle.run_control(lambda: pipe.re_isq(ggml_type))
        return True

    # ------------------------------------------------------------- chat
    @staticmethod
    def _parse_constraint(body):
        """Map request `grammar: {type, value}` (ref chat_completion.rs
        :153-338) or OpenAI `response_format` (json_object / json_schema —
        compiled onto the same CFG engine, grammar/json_schema.py) to a
        Constraint."""
        from mistralrs_tpu.grammar.recognizer import Constraint

        rf = body.get("response_format")
        if rf and rf.get("type") in ("json_object", "json_schema"):
            from mistralrs_tpu.grammar.json_schema import schema_to_yacc

            if rf["type"] == "json_object":
                return Constraint("yacc", schema_to_yacc({"type": "object"}))
            js = rf.get("json_schema", {})
            schema = js.get("schema", js)  # OpenAI nests under .schema
            return Constraint("yacc", schema_to_yacc(schema))
        g = body.get("grammar")
        if not g:
            return None
        kind = g.get("type")
        if kind == "json_schema":
            from mistralrs_tpu.grammar.json_schema import schema_to_yacc

            import json as _json

            val = g.get("value", "{}")
            schema = _json.loads(val) if isinstance(val, str) else val
            return Constraint("yacc", schema_to_yacc(schema))
        if kind not in ("regex", "yacc"):
            raise ValueError(
                f"grammar type must be regex|yacc|json_schema, got {kind!r}")
        return Constraint(kind, g.get("value", ""))

    @staticmethod
    def _parse_tools(body):
        tools = body.get("tools")
        if not tools:
            return None
        from mistralrs_tpu.tools import Tool, ToolCallingMatcher, ToolChoice

        choice = ToolChoice.from_openai(body.get("tool_choice"))
        [Tool.from_openai(t) for t in tools]  # validate shapes
        return ToolCallingMatcher(choice)

    async def chat_completions(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        try:
            sampling = _parse_sampling(body)
            constraint = self._parse_constraint(body)
            matcher = self._parse_tools(body)
            messages = body["messages"]
            images = None
            if hasattr(self.runner, "processor"):
                # vision model: image_url content parts -> pixel values
                # (ref RequestMessage::VisionChat)
                from mistralrs_tpu.api import extract_images

                text, imgs = extract_images(
                    messages, self.runner.processor.image_token
                )
                # decode at the trust boundary: remote clients may send
                # data:/base64 only, never server-local file paths
                from mistralrs_tpu.vision.processor import decode_image

                imgs = [decode_image(im, allow_local_files=False)
                        for im in imgs]
                prompt_toks, images = await asyncio.to_thread(
                    self.runner.processor, text, imgs
                )
            else:
                prompt_toks = await asyncio.to_thread(
                    self.runner._prompt_from_messages, messages
                )
        except Exception as e:
            return web.json_response({"error": str(e)}, status=400)
        if body.get("stream"):
            return await self._stream(request, prompt_toks, sampling, chat=True,
                                      constraint=constraint, images=images)
        return await self._blocking(prompt_toks, sampling, chat=True,
                                    constraint=constraint, matcher=matcher,
                                    images=images,
                                    return_logprobs=bool(body.get("logprobs")))

    async def completions(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        try:
            sampling = _parse_sampling(body)
            constraint = self._parse_constraint(body)
            # legacy `logprobs` is an int (top-N), not the chat bool
            lp = body.get("logprobs")
            if isinstance(lp, int) and not isinstance(lp, bool) and lp > 0:
                sampling = dataclasses.replace(sampling, top_n_logprobs=lp)
            prompt = body["prompt"]
            token_prompt = None
            if isinstance(prompt, list):
                if prompt and isinstance(prompt[0], int):
                    # raw token-id prompt (ref RequestMessage::CompletionTokens)
                    token_prompt = [int(t) for t in prompt]
                    prompt = None
                else:
                    prompt = prompt[0]
            echo = bool(body.get("echo_prompt") or body.get("echo"))
            if echo and body.get("stream"):
                raise ValueError("echo_prompt cannot stream")
            echo_text = None
            if echo:
                # token-id prompts echo their detokenization
                echo_text = (prompt if prompt is not None else
                             self.runner.tokenizer.decode(token_prompt))
            # best_of (ref request.rs:31, sequence.rs get_completion_choices):
            # sample `best_of` streams server-side, return the `n` best ranked
            # by mean token logprob
            n = sampling.n_choices
            best_of = int(body.get("best_of") or n)
            if best_of < n:
                raise ValueError(f"best_of ({best_of}) must be >= n ({n})")
            if best_of > n and body.get("stream"):
                raise ValueError("best_of > n cannot stream (candidates are "
                                 "ranked only after completion)")
            if best_of > n:
                sampling = dataclasses.replace(sampling, n_choices=best_of)
            if token_prompt is not None:
                prompt_toks = token_prompt
            else:
                prompt_toks = await asyncio.to_thread(
                    self.runner.tokenizer.encode, prompt)
        except Exception as e:
            return web.json_response({"error": str(e)}, status=400)
        if body.get("stream"):
            return await self._stream(request, prompt_toks, sampling, chat=False,
                                      constraint=constraint)
        return await self._blocking(prompt_toks, sampling, chat=False,
                                    constraint=constraint,
                                    return_logprobs=bool(body.get("logprobs")),
                                    top_n=n, echo_text=echo_text)

    # ------------------------------------------------------------- impls
    @staticmethod
    def _logprobs_json(seq):
        """OpenAI logprobs content block (ref chat_completion.rs logprobs)."""
        if not seq.return_logprobs or not seq.logprobs:
            return None
        content = []
        for lp in seq.logprobs:
            content.append({
                "token": str(lp.token),
                "logprob": lp.logprob,
                "top_logprobs": [
                    {"token": str(t.token), "logprob": t.logprob}
                    for t in (lp.top_logprobs or [])
                ],
            })
        return {"content": content}

    async def _blocking(self, toks: list[int], sampling: SamplingParams, chat: bool,
                        constraint=None, matcher=None, images=None,
                        return_logprobs=False, top_n: int | None = None,
                        echo_text: str | None = None):
        rid = ("chatcmpl-" if chat else "cmpl-") + uuid.uuid4().hex[:20]
        group = await asyncio.to_thread(
            self.runner.handle.submit,
            GenerationRequest(toks, sampling, request_id=rid, constraint=constraint,
                              images=images, return_logprobs=return_logprobs),
        )
        while not group.all_done():
            await asyncio.sleep(0.005)
        usage = group.usage()
        if chat:
            choices = []
            for i, s in enumerate(group.seqs):
                # .output() substitutes the error detail for errored seqs
                text = s.output().text
                msg = {"role": "assistant", "content": text}
                finish = s.stop_reason.value if s.stop_reason else "stop"
                calls = matcher.get_calls(text) if matcher is not None else []
                if calls:
                    # tool-call response shape (ref tools/response.rs)
                    msg = {"role": "assistant", "content": None,
                           "tool_calls": [c.to_openai() for c in calls]}
                    finish = "tool_calls"
                choices.append({
                    "index": i,
                    "message": msg,
                    "finish_reason": finish,
                    "logprobs": self._logprobs_json(s),
                })
            obj = "chat.completion"
        else:
            seqs = group.seqs
            if top_n is not None and len(seqs) > top_n:
                # best_of ranking: descending mean token logprob (ref
                # sequence.rs:723-731 sorts completion choices by logprob)
                def _mean_lp(s):
                    lps = [lp.logprob for lp in s.logprobs]
                    return sum(lps) / len(lps) if lps else float("-inf")

                seqs = sorted(seqs, key=_mean_lp, reverse=True)[:top_n]
            choices = [
                {
                    "index": i,
                    # echo_prompt prepends the prompt text (ref engine/mod.rs:706)
                    "text": (echo_text or "") + s.output().text,
                    "finish_reason": s.stop_reason.value if s.stop_reason else "stop",
                    "logprobs": self._logprobs_json(s),
                }
                for i, s in enumerate(seqs)
            ]
            obj = "text_completion"
        return web.json_response(
            {
                "id": rid,
                "object": obj,
                "created": int(time.time()),
                "model": self.model_id,
                "choices": choices,
                "usage": {
                    "prompt_tokens": usage.prompt_tokens,
                    "completion_tokens": usage.completion_tokens,
                    "total_tokens": usage.total_tokens,
                    "avg_prompt_tok_per_sec": usage.avg_prompt_tok_per_sec,
                    "avg_compl_tok_per_sec": usage.avg_compl_tok_per_sec,
                },
            }
        )

    async def _stream(self, request, toks, sampling: SamplingParams, chat: bool,
                      constraint=None, images=None):
        rid = ("chatcmpl-" if chat else "cmpl-") + uuid.uuid4().hex[:20]
        loop = asyncio.get_running_loop()
        q: asyncio.Queue = asyncio.Queue()

        def on_delta(seq, delta, reason):
            loop.call_soon_threadsafe(q.put_nowait, (seq, delta, reason))

        resp = web.StreamResponse(
            status=200,
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
                "Connection": "keep-alive",
            },
        )
        await resp.prepare(request)
        await asyncio.to_thread(
            self.runner.handle.submit,
            GenerationRequest(toks, sampling, request_id=rid, stream=on_delta,
                              constraint=constraint, images=images),
        )
        obj = "chat.completion.chunk" if chat else "text_completion"
        finished = 0
        n = sampling.n_choices
        while finished < n:
            try:
                seq, delta, reason = await asyncio.wait_for(q.get(), timeout=10.0)
            except asyncio.TimeoutError:
                # SSE keep-alive (ref chat_completion.rs keep-alive interval);
                # a failed write = dead receiver -> cancel the generation
                # (ref sampling.rs:86-97)
                try:
                    await resp.write(b": keep-alive\n\n")
                except (ConnectionResetError, ConnectionError):
                    self.runner.handle.engine.cancel_request(rid)
                    return resp
                continue
            except asyncio.CancelledError:
                self.runner.handle.engine.cancel_request(rid)
                raise
            if reason is not None:
                finished += 1
            idx = seq.group.seqs.index(seq) if seq.group else 0
            if chat:
                choice = {
                    "index": idx,
                    "delta": {"role": "assistant", "content": delta} if delta or not reason else {},
                    "finish_reason": reason,
                }
            else:
                choice = {"index": idx, "text": delta, "finish_reason": reason}
            chunk = {
                "id": rid,
                "object": obj,
                "created": int(time.time()),
                "model": self.model_id,
                "choices": [choice],
            }
            try:
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
            except (ConnectionResetError, ConnectionError):
                self.runner.handle.engine.cancel_request(rid)
                return resp
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp


def run_server(runner, host: str = "0.0.0.0", port: int = 8080, model_id: str = "default"):
    server = OpenAIServer(runner, model_id)
    # handler_cancellation: a client disconnect cancels the handler task,
    # which cancels the generation (dead-receiver parity, sampling.rs:86-97;
    # aiohttp >= 3.9 no longer cancels handlers by default)
    web.run_app(server.app(), host=host, port=port, handler_cancellation=True)


def _openapi_schema(model_id: str) -> dict:
    """Minimal OpenAPI 3 document for the served routes."""
    req = {"required": True, "content": {"application/json": {"schema": {"type": "object"}}}}
    ok = {"200": {"description": "OK"}}
    return {
        "openapi": "3.0.0",
        "info": {"title": "mistralrs-tpu", "version": "0.1.0",
                 "description": f"OpenAI-compatible serving for {model_id}"},
        "paths": {
            "/v1/chat/completions": {"post": {
                "summary": "Chat completion (stream, grammar {type: regex|yacc, value},"
                           " tools/tool_choice, image_url content parts)",
                "requestBody": req, "responses": ok}},
            "/v1/completions": {"post": {"summary": "Text completion",
                                         "requestBody": req, "responses": ok}},
            "/v1/models": {"get": {"summary": "List models", "responses": ok}},
            "/health": {"get": {"summary": "Liveness", "responses": ok}},
            "/re_isq": {"post": {"summary": "Runtime re-quantization",
                                 "requestBody": req, "responses": ok}},
            "/activate_adapters": {"post": {"summary": "Activate LoRA adapters",
                                            "requestBody": req, "responses": ok}},
        },
    }
