"""Bundled fallback chat templates (ref chat_templates/*.json + main.rs:77).

Each .json holds {"chat_template": "<jinja>"} in tokenizer_config format.
`resolve_chat_template` accepts a bundled name ("chatml"), a path to a
.json ({"chat_template": ...} or a full tokenizer_config.json), or a path
to a raw .jinja/.j2 template file.
"""

from __future__ import annotations

import json
import os

_DIR = os.path.dirname(__file__)


def resolve_named_template(tpl):
    """tokenizer_config chat_template value -> template string: HF allows a
    list of {name, template}; 'default' wins, else the first entry. The one
    definition — utils/tokenizer.TokenizerWrapper uses it too."""
    if isinstance(tpl, list):
        named = {t["name"]: t["template"] for t in tpl}
        return named.get("default") or next(iter(named.values()))
    return tpl


def bundled_names() -> list[str]:
    return sorted(
        f[:-5] for f in os.listdir(_DIR) if f.endswith(".json")
    )


def resolve_chat_template(name_or_path: str) -> str:
    """Return the jinja template string for a --chat-template argument."""
    bundled = os.path.join(_DIR, name_or_path + ".json")
    if os.sep not in name_or_path and os.path.exists(bundled):
        path = bundled
    else:
        path = name_or_path
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"chat template {name_or_path!r}: not a bundled name "
            f"({', '.join(bundled_names())}) nor an existing file"
        )
    if path.endswith(".json"):
        with open(path) as f:
            doc = json.load(f)
        tpl = resolve_named_template(doc.get("chat_template"))
        if not isinstance(tpl, str):
            raise ValueError(f"{path}: no 'chat_template' key")
        return tpl
    with open(path) as f:
        return f.read()
