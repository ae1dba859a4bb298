"""Tool (function) calling.

Reference parity: mistralrs-core/src/tools/ — `ToolCallingMatcher::get_call`
(mod.rs:33): parse model output as one `{name, parameters}` JSON object or an
array of them into OpenAI-shaped tool calls; `ToolChoice::{None,Auto,Tool}`
and the Tool/Function request types (tools/{request,response}.rs).
"""

from __future__ import annotations

import dataclasses
import json
import uuid
from typing import Any


@dataclasses.dataclass
class Function:
    name: str
    description: str | None = None
    parameters: dict[str, Any] | None = None


@dataclasses.dataclass
class Tool:
    function: Function
    type: str = "function"

    @classmethod
    def from_openai(cls, d: dict[str, Any]) -> "Tool":
        f = d.get("function", {})
        return cls(Function(
            name=f.get("name", ""),
            description=f.get("description"),
            parameters=f.get("parameters"),
        ), type=d.get("type", "function"))


@dataclasses.dataclass
class ToolChoice:
    """none | auto | a specific tool (ref request.rs ToolChoice)."""

    kind: str  # "none" | "auto" | "tool"
    tool: Tool | None = None

    @classmethod
    def from_openai(cls, v: Any) -> "ToolChoice":
        if v is None or v == "auto":
            return cls("auto")
        if v == "none":
            return cls("none")
        if isinstance(v, dict):
            return cls("tool", Tool.from_openai(v))
        raise ValueError(f"bad tool_choice: {v!r}")


@dataclasses.dataclass
class ToolCall:
    id: str
    name: str
    arguments: str  # JSON string, OpenAI-shaped

    def to_openai(self) -> dict[str, Any]:
        return {
            "id": self.id,
            "type": "function",
            "function": {"name": self.name, "arguments": self.arguments},
        }


class ToolCallingMatcher:
    """Extract tool calls from generated text (ref tools/mod.rs:33-120)."""

    def __init__(self, choice: ToolChoice):
        self.choice = choice

    def get_calls(self, text: str) -> list[ToolCall]:
        if self.choice.kind == "none":
            return []
        calls = self._try_parse(text.strip())
        if self.choice.kind == "tool" and self.choice.tool is not None:
            want = self.choice.tool.function.name
            calls = [c for c in calls if c.name == want]
        return calls

    @staticmethod
    def _try_parse(text: str) -> list[ToolCall]:
        try:
            obj = json.loads(text)
        except json.JSONDecodeError:
            return []
        items = obj if isinstance(obj, list) else [obj]
        out: list[ToolCall] = []
        for item in items:
            if not isinstance(item, dict):
                return []
            name = item.get("name")
            params = item.get("parameters", item.get("arguments"))
            if not isinstance(name, str) or params is None:
                return []
            out.append(ToolCall(
                id=f"call-{uuid.uuid4().hex[:12]}",
                name=name,
                arguments=params if isinstance(params, str) else json.dumps(params),
            ))
        return out
