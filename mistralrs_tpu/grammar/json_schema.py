"""JSON-schema constrained decoding: compile a schema to a .y grammar for
the CFG recognizer (grammar/cfg.py scannerless Earley).

Extension beyond the reference's Constraint::{Regex,Yacc} (request.rs):
the OpenAI API's `response_format: {type: "json_schema"}` compiles onto the
same grammar engine, so structured outputs ride the existing token-trie
masking path. The construction mirrors llama.cpp's json-schema-to-grammar:
properties are emitted in declaration order with optional ones skippable
(a grammar cannot enforce unordered required keys without exponential
blowup), strings/numbers are single regex terminals (so SKIP whitespace can
never intrude mid-lexeme), and `$defs`/`$ref` become named rules.

Supported keywords: type (object/array/string/integer/number/boolean/null),
properties/required, items, minItems/maxItems (unrolled up to 64), enum,
const, anyOf/oneOf, string pattern (anchored) / format=date-time-ish
ignored, $ref to #/$defs/... or #/definitions/....
"""

from __future__ import annotations

import json
import re
from typing import Any

_STRING_RX = (
    '"/\\"([^\\"\\\\\\x00-\\x1f]|\\\\[\\"\\\\/bfnrt]|\\\\u[0-9a-fA-F]{4})*\\"/"'
)
_NUMBER_RX = '"/-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?/"'
_INTEGER_RX = '"/-?(0|[1-9][0-9]*)/"'
_MAX_UNROLL = 64


def _quote_literal(s: str) -> str:
    """A literal terminal token for the .y dialect (single-quoted;
    parse_yacc unicode-unescapes the body)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _json_literal(value: Any) -> str:
    return _quote_literal(json.dumps(value, ensure_ascii=True))


class _Builder:
    def __init__(self, root_schema: dict):
        self.root = root_schema
        self.rules: dict[str, str] = {}  # name -> " : alts ;"
        self.order: list[str] = []
        self._ref_names: dict[str, str] = {}  # raw $defs name -> unique rule

    def _unique_ref_name(self, raw: str) -> str:
        if raw not in self._ref_names:
            base = _sanitize(raw)
            cand, i = base, 1
            while cand in self._ref_names.values():
                i += 1
                cand = f"{base}_{i}"
            self._ref_names[raw] = cand
        return self._ref_names[raw]

    def add(self, name: str, alts: list[str]) -> str:
        if name not in self.rules:
            self.order.append(name)
            self.rules[name] = " | ".join(a if a else "" for a in alts)
        return name

    def _resolve_ref(self, ref: str) -> tuple[str, dict]:
        m = re.fullmatch(r"#/(\$defs|definitions)/([^/]+)", ref)
        if not m:
            raise ValueError(f"unsupported $ref {ref!r}")
        defs = self.root.get(m.group(1), {})
        if m.group(2) not in defs:
            raise ValueError(f"$ref target not found: {ref!r}")
        return self._unique_ref_name(m.group(2)), defs[m.group(2)]

    def visit(self, schema: dict, name: str) -> str:
        """Returns the rule name generating this schema."""
        if "$ref" in schema:
            ref_name, target = self._resolve_ref(schema["$ref"])
            rule = f"def_{ref_name}"
            if rule not in self.rules:
                self.add(rule, ["__pending__"])  # break ref cycles
                body = self.visit(target, rule + "_v")
                self.rules[rule] = body
            return rule
        if "const" in schema:
            return self.add(name, [_json_literal(schema["const"])])
        if "enum" in schema:
            return self.add(name, [_json_literal(v) for v in schema["enum"]])
        for comb in ("anyOf", "oneOf"):
            if comb in schema:
                subs = [
                    self.visit(s, f"{name}_{comb[:3]}{i}")
                    for i, s in enumerate(schema[comb])
                ]
                return self.add(name, subs)

        t = schema.get("type")
        if isinstance(t, list):
            subs = [self.visit({**schema, "type": ti}, f"{name}_t{ti}") for ti in t]
            return self.add(name, subs)
        if t == "string":
            pattern = schema.get("pattern")
            if pattern:
                body = re.sub(r"^\^", "", pattern)
                body = re.sub(r"(?<!\\)\$\Z", "", body)
                rx = '"/\\"' + body.replace('"', '\\"') + '\\"/"'
                return self.add(name, [rx])
            return self.add(name, [_STRING_RX])
        if t == "integer":
            return self.add(name, [_INTEGER_RX])
        if t == "number":
            return self.add(name, [_NUMBER_RX])
        if t == "boolean":
            return self.add(name, ["'true'", "'false'"])
        if t == "null":
            return self.add(name, ["'null'"])
        if t == "array":
            return self._array(schema, name)
        if t == "object" or "properties" in schema:
            return self._object(schema, name)
        # unconstrained: any JSON value
        return self._any_value(name)

    def _any_value(self, name: str) -> str:
        self.add("json_any", [
            _STRING_RX, _NUMBER_RX, "'true'", "'false'", "'null'",
            "json_any_obj", "json_any_arr",
        ])
        self.add("json_any_obj",
                 ["'{' '}'", "'{' json_any_members '}'"])
        self.add("json_any_members",
                 [f"{_STRING_RX} ':' json_any",
                  f"json_any_members ',' {_STRING_RX} ':' json_any"])
        self.add("json_any_arr", ["'[' ']'", "'[' json_any_items ']'"])
        self.add("json_any_items",
                 ["json_any", "json_any_items ',' json_any"])
        return "json_any"

    def _array(self, schema: dict, name: str) -> str:
        item = self.visit(schema.get("items", {}), f"{name}_item")
        lo = int(schema.get("minItems", 0))
        hi = schema.get("maxItems")
        if hi is not None and int(hi) > 1024:
            raise ValueError("maxItems > 1024 unsupported (grammar size)")
        if hi is not None and int(hi) <= _MAX_UNROLL:
            alts = []
            for n in range(lo, int(hi) + 1):
                if n == 0:
                    alts.append("'[' ']'")
                else:
                    alts.append("'[' " + " ',' ".join([item] * n) + " ']'")
            if not alts:
                raise ValueError("maxItems < minItems")
            return self.add(name, alts)
        if hi is not None:
            hi = int(hi)
            if hi < lo:
                raise ValueError("maxItems < minItems")
            # bounded tail: opt_k accepts 0..(hi-k) further ',' item
            for k in range(hi, lo, -1):
                tail = f" {name}_opt{k + 1}" if k < hi else ""
                self.add(f"{name}_opt{k}", ["", f"',' {item}{tail}"])
            head = " ',' ".join([item] * max(lo, 1))
            tail = f" {name}_opt{max(lo, 1) + 1}" if max(lo, 1) < hi else ""
            if lo == 0:
                return self.add(name, ["'[' ']'", f"'[' {head}{tail} ']'"])
            return self.add(name, [f"'[' {head}{tail} ']'"])
        lst = self.add(f"{name}_list", [item, f"{name}_list ',' {item}"])
        if lo == 0:
            return self.add(name, ["'[' ']'", f"'[' {lst} ']'"])
        head = " ',' ".join([item] * lo)
        if lo == 1:
            return self.add(name, [f"'[' {lst} ']'"])
        return self.add(name, [f"'[' {head} ']'", f"'[' {head} ',' {lst} ']'"])

    def _object(self, schema: dict, name: str) -> str:
        props = list(schema.get("properties", {}).items())
        required = set(schema.get("required", []))
        # 'required' keys absent from 'properties' make the schema
        # unsatisfiable by this ordered-properties grammar — fail loudly
        missing = required - {k for k, _ in props}
        if missing:
            raise ValueError(
                f"required properties not declared in 'properties': {sorted(missing)}")
        if not props:
            if not schema.get("additionalProperties", True):
                return self.add(name, ["'{' '}'"])
            self._any_value(name)  # registers the json_any_obj machinery
            return self.add(name, ["json_any_obj"])
        items = []
        for i, (key, sub) in enumerate(props):
            v = self.visit(sub, f"{name}_p{i}")
            items.append((key in required, f"{_json_literal(key)} ':' {v}"))

        n = len(items)
        # first present property j is legal iff properties < j are optional;
        # rest_j continues with any k > j whose gap is all-optional
        def opts_between(a: int, b: int) -> bool:
            return all(not items[i][0] for i in range(a, b))

        first_alts = []
        for j in range(n):
            if opts_between(0, j):
                first_alts.append(f"{items[j][1]} {name}_r{j}")
        if opts_between(0, n):
            first_alts.append("")  # empty object body
        for j in range(n):
            rest = []
            for k in range(j + 1, n):
                if opts_between(j + 1, k):
                    rest.append(f"',' {items[k][1]} {name}_r{k}")
            if opts_between(j + 1, n):
                rest.append("")
            self.add(f"{name}_r{j}", rest)
        body = self.add(f"{name}_body", first_alts)
        return self.add(name, [f"'{{' {body} '}}'"])


def _sanitize(s: str) -> str:
    return re.sub(r"[^0-9a-zA-Z_]", "_", s)


def schema_to_yacc(schema: dict) -> str:
    """Compile a JSON schema to a .y grammar accepted by grammar/cfg.py."""
    b = _Builder(schema)
    root = b.visit(schema, "root")
    lines = ["%start start", "%%", f"start : {root} ;"]
    for name in b.order:
        lines.append(f"{name} : {b.rules[name]} ;")
    lines.append("SKIP : ' ' | '\\n' | '\\t' | '\\r' ;")
    return "\n".join(lines)
