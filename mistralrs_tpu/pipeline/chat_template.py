"""Chat template rendering (HF jinja templates).

Reference parity: mistralrs-core/src/pipeline/chat_template.rs —
`apply_chat_template_to` with minijinja + `raise_exception`, `tojson`,
`strftime_now` (:48-98) — and processing.rs `MessagesAction`
(FlattenOnlyText for text-only templates vs Keep for vision processors).

Rendering uses jinja2 with the same extra callables HF/minijinja expose, so
templates from tokenizer_config.json render byte-identically to
`transformers.apply_chat_template` (golden tests in
tests/test_chat_template.py compare against it directly).
"""

from __future__ import annotations

import datetime
import json
from typing import Any

import jinja2


class TemplateError(Exception):
    pass


def _raise_exception(msg: str):
    raise TemplateError(msg)


def _tojson(value: Any, indent: int | None = None) -> str:
    return json.dumps(value, ensure_ascii=False, indent=indent)


def _strftime_now(fmt: str) -> str:
    return datetime.datetime.now().strftime(fmt)


_ENV = jinja2.Environment(
    loader=jinja2.BaseLoader(),
    trim_blocks=True,
    lstrip_blocks=True,
    extensions=["jinja2.ext.loopcontrols"],
)
_ENV.filters["tojson"] = _tojson
_ENV.globals["raise_exception"] = _raise_exception
_ENV.globals["strftime_now"] = _strftime_now


def apply_chat_template(
    template: str,
    messages: list[dict[str, Any]],
    *,
    add_generation_prompt: bool = True,
    bos_token: str | None = None,
    eos_token: str | None = None,
    unk_token: str | None = None,
    tools: list[dict[str, Any]] | None = None,
    **extra: Any,
) -> str:
    tmpl = _ENV.from_string(template)
    ctx = dict(
        messages=messages,
        add_generation_prompt=add_generation_prompt,
        bos_token=bos_token or "",
        eos_token=eos_token or "",
        unk_token=unk_token or "",
        **extra,
    )
    if tools is not None:
        ctx["tools"] = tools
    return tmpl.render(**ctx)


def flatten_text_content(messages: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """OpenAI-style content arrays -> plain strings for text-only templates
    (ref processing.rs MessagesAction::FlattenOnlyText)."""
    out = []
    for m in messages:
        c = m.get("content")
        if isinstance(c, list):
            text = "".join(
                part.get("text", "") for part in c if part.get("type") in (None, "text")
            )
            m = {**m, "content": text}
        out.append(m)
    return out
