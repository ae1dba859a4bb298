"""Tokenizer loading + incremental detokenization.

Reference parity: mistralrs-core/src/utils/tokenizer.rs (HF tokenizer.json
load) and sequence.rs's byte-buffer streaming decode. Uses the `tokenizers`
library (same Rust core as the reference's `tokenizers` crate).
"""

from __future__ import annotations

import json
import os
from typing import Any


class TokenizerWrapper:
    def __init__(self, tok, *, bos_token: str | None = None, eos_token: str | None = None,
                 chat_template: str | None = None, eos_token_ids: set[int] | None = None):
        self.tok = tok
        self.bos_token = bos_token
        self.eos_token = eos_token
        self.chat_template = chat_template
        self.eos_token_ids = eos_token_ids or set()

    # --------------------------------------------------------------- factory
    @classmethod
    def from_hf_dir(cls, path: str) -> "TokenizerWrapper":
        from tokenizers import Tokenizer

        tok = Tokenizer.from_file(os.path.join(path, "tokenizer.json"))
        bos = eos = chat_template = None
        eos_ids: set[int] = set()
        tc_path = os.path.join(path, "tokenizer_config.json")
        if os.path.exists(tc_path):
            with open(tc_path) as f:
                tc = json.load(f)
            bos = _token_str(tc.get("bos_token"))
            eos = _token_str(tc.get("eos_token"))
            from mistralrs_tpu.chat_templates import resolve_named_template

            chat_template = resolve_named_template(tc.get("chat_template"))
        # eos union with generation_config (ref chat_template.rs
        # calculate_eos_tokens :100-160)
        if eos is not None:
            tid = tok.token_to_id(eos)
            if tid is not None:
                eos_ids.add(tid)
        gc_path = os.path.join(path, "generation_config.json")
        if os.path.exists(gc_path):
            with open(gc_path) as f:
                gc = json.load(f)
            g_eos = gc.get("eos_token_id")
            if isinstance(g_eos, int):
                eos_ids.add(g_eos)
            elif isinstance(g_eos, list):
                eos_ids.update(g_eos)
        return cls(tok, bos_token=bos, eos_token=eos, chat_template=chat_template,
                   eos_token_ids=eos_ids)

    # --------------------------------------------------------------- encode
    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        return self.tok.encode(text, add_special_tokens=add_special_tokens).ids

    def decode(self, ids: list[int], skip_special_tokens: bool = True) -> str:
        return self.tok.decode(list(ids), skip_special_tokens=skip_special_tokens)

    def token_to_id(self, token: str) -> int | None:
        return self.tok.token_to_id(token)

    @property
    def vocab_size(self) -> int:
        return self.tok.get_vocab_size()

    def id_to_token(self, idx: int) -> str | None:
        return self.tok.id_to_token(idx)

    @property
    def special_token_ids(self) -> set[int]:
        """Ids of added/special tokens (excluded from grammar byte tries)."""
        try:
            return set(self.tok.get_added_tokens_decoder().keys())
        except AttributeError:
            return set()

    def grammar_vocab(self) -> list[bytes]:
        """Per-token byte strings for grammar-constrained decoding."""
        from mistralrs_tpu.grammar.toktrie import vocab_bytes

        return vocab_bytes(self)

    def detokenizer(self):
        """Callable for Sequence streaming decode."""
        return lambda ids: self.decode(ids)


def _token_str(v: Any) -> str | None:
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, dict):  # AddedToken serde form
        return v.get("content")
    return None
