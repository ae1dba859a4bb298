"""Per-sequence grammar recognizer state.

Reference parity: mistralrs-core/src/aici/recognizer.rs (`StackRecognizer`,
`FunctionalRecognizer`), rx.rs `RecRx`, and request.rs
`Constraint::{Regex, Yacc, None}`. The engine consults the recognizer in the
constrained second sampling pass (pipeline/sampling.rs:314-354): sample,
check `allowed(token)`, on rejection mask logits with `mask()` and resample,
then `advance(token)`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mistralrs_tpu.grammar.regex import DEAD, DenseDFA, compile_regex
from mistralrs_tpu.grammar.toktrie import TokTrie


@dataclasses.dataclass
class Constraint:
    """Ref request.rs Constraint enum (:14-133)."""

    kind: str  # "none" | "regex" | "yacc"
    value: str = ""

    @classmethod
    def none(cls) -> "Constraint":
        return cls("none")

    @classmethod
    def regex(cls, pattern: str) -> "Constraint":
        return cls("regex", pattern)

    @classmethod
    def yacc(cls, grammar: str) -> "Constraint":
        return cls("yacc", grammar)


class DfaRecognizer:
    """Byte-DFA recognizer over the token trie (regex constraints; the CFG
    recognizer compiles grammars to the same interface)."""

    def __init__(self, trie: TokTrie, dfa: DenseDFA, vocab: list[bytes]):
        self.trie = trie
        self.dfa = dfa
        self.vocab = vocab
        self.state = dfa.start
        self._mask_cache: tuple[int, np.ndarray] | None = None

    def clone(self) -> "DfaRecognizer":
        r = DfaRecognizer(self.trie, self.dfa, self.vocab)
        r.state = self.state
        return r

    # -- queries
    def allowed(self, token: int) -> bool:
        bs = self.vocab[token] if 0 <= token < len(self.vocab) else b""
        if not bs:
            return False  # special tokens handled via eos_allowed
        return self.dfa.walk(self.state, bs) != DEAD

    def mask(self) -> np.ndarray:
        """Boolean [vocab] allowed-token mask at the current state."""
        if self._mask_cache is not None and self._mask_cache[0] == self.state:
            return self._mask_cache[1]
        m = self.trie.compute_mask(self.dfa, self.state)
        self._mask_cache = (self.state, m)
        return m

    @property
    def eos_allowed(self) -> bool:
        """EOS permitted iff the bytes so far form a complete match
        (ref rx.rs special_allowed EndOfSentence)."""
        return bool(self.dfa.accept[self.state])

    @property
    def is_dead(self) -> bool:
        return self.state == DEAD

    # -- mutation
    def advance(self, token: int) -> bool:
        bs = self.vocab[token] if 0 <= token < len(self.vocab) else b""
        self.state = self.dfa.walk(self.state, bs)
        self._mask_cache = None
        return self.state != DEAD


def make_recognizer(constraint: Constraint, trie: TokTrie, vocab: list[bytes]):
    """Build the per-sequence recognizer for a request constraint
    (ref engine/mod.rs add_request recognizer construction :668)."""
    if constraint.kind == "none":
        return None
    if constraint.kind == "regex":
        return DfaRecognizer(trie, compile_regex(constraint.value), vocab)
    if constraint.kind == "yacc":
        from mistralrs_tpu.grammar.cfg import CfgRecognizer

        return CfgRecognizer.from_yacc(constraint.value, trie, vocab)
    raise ValueError(f"unknown constraint kind: {constraint.kind}")
