"""Token trie: which vocabulary tokens are allowed next under a byte DFA.

Reference parity: mistralrs-core/src/aici/toktree.rs `TokTrie` (:53-797) +
svob.rs `SimpleVob`. Different design, same job: the reference walks a
child-pointer trie invoking a `Recognizer` callback per byte; we linearize
the trie in DFS pre-order (arrays: byte, token_id, subtree_end) and take the
*product with a dense DFA* in one linear pass — no callbacks, O(1) subtree
pruning via `subtree_end`, and a C++ kernel (native/toktrie_mask.cpp) for
the hot vocab-wide mask computation with a numpy/python fallback.
"""

from __future__ import annotations

import numpy as np

from mistralrs_tpu.grammar.regex import DEAD, DenseDFA

# GPT-2 byte-level BPE unicode<->byte map (public algorithm from the GPT-2
# tokenizer; also used by the reference's gguf tokenizer conversion)
def _bytes_to_unicode() -> dict[int, str]:
    bs = list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_UNICODE_TO_BYTE = {v: k for k, v in _bytes_to_unicode().items()}


def token_bytes_from_str(tok: str) -> bytes:
    """Decode one vocab entry's surface string to raw bytes, handling
    sentencepiece (U+2581 = space, <0xNN> byte tokens) and byte-level BPE
    alphabets."""
    if tok.startswith("<0x") and tok.endswith(">") and len(tok) == 6:
        try:
            return bytes([int(tok[3:5], 16)])
        except ValueError:
            pass
    if all(c in _UNICODE_TO_BYTE for c in tok):
        return bytes(_UNICODE_TO_BYTE[c] for c in tok)
    return tok.replace("▁", " ").encode("utf-8")


def vocab_bytes(tokenizer) -> list[bytes]:
    """Byte sequence of every token id (special tokens -> b\"\")."""
    size = tokenizer.vocab_size
    get = tokenizer.id_to_token
    specials = set(getattr(tokenizer, "special_token_ids", ()) or ())
    out: list[bytes] = []
    for i in range(size):
        if i in specials:
            out.append(b"")
            continue
        s = get(i)
        out.append(b"" if s is None else token_bytes_from_str(s))
    return out


class TokTrie:
    """DFS-linearized byte trie over the vocabulary."""

    def __init__(self, vocab: list[bytes]):
        self.vocab_size = len(vocab)

        class _N(dict):
            token = -1

        troot = _N()
        for tid, bs in enumerate(vocab):
            if not bs:
                continue
            node = troot
            for b in bs:
                node = node.setdefault(b, _N())
            if node.token < 0:  # first token with these bytes wins; see _dups
                node.token = tid
        # flatten to DFS pre-order arrays
        byte_l: list[int] = []
        token_l: list[int] = []
        end_l: list[int] = []
        self.max_depth = 0

        def emit(node: _N, depth: int) -> None:
            self.max_depth = max(self.max_depth, depth)
            for b in sorted(node.keys()):
                child = node[b]
                idx = len(byte_l)
                byte_l.append(b)
                token_l.append(child.token)
                end_l.append(-1)
                emit(child, depth + 1)
                end_l[idx] = len(byte_l)

        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 10000))
        try:
            emit(troot, 0)
        finally:
            sys.setrecursionlimit(old)
        self.byte = np.asarray(byte_l, np.int32)
        self.token = np.asarray(token_l, np.int32)
        self.end = np.asarray(end_l, np.int32)
        self.n_nodes = len(byte_l)
        # duplicate byte-sequences: map winner token -> other ids
        self._dups: dict[int, list[int]] = {}
        seen: dict[bytes, int] = {}
        for tid, bs in enumerate(vocab):
            if not bs:
                continue
            if bs in seen:
                self._dups.setdefault(seen[bs], []).append(tid)
            else:
                seen[bs] = tid

    # ------------------------------------------------------------- masks
    def compute_mask(self, dfa: DenseDFA, state: int) -> np.ndarray:
        """Boolean [vocab] mask of tokens whose bytes keep the DFA viable
        from `state` (ref compute_bias toktree.rs:541)."""
        from mistralrs_tpu.grammar.native import native_mask

        mask = native_mask(self, dfa, state) if self.max_depth < 500 else None
        if mask is None:
            mask = self._mask_py(dfa, state)
        for winner, dups in self._dups.items():
            if mask[winner]:
                mask[dups] = True
        return mask

    def _mask_py(self, dfa: DenseDFA, state: int) -> np.ndarray:
        mask = np.zeros(self.vocab_size, bool)
        table = dfa.table
        byte, token, end = self.byte, self.token, self.end
        stack_end = [self.n_nodes]
        stack_state = [state]
        i = 0
        while i < self.n_nodes:
            while i >= stack_end[-1]:
                stack_end.pop()
                stack_state.pop()
            s = int(table[stack_state[-1], byte[i]])
            if s == DEAD:
                i = int(end[i])  # prune subtree
                continue
            t = int(token[i])
            if t >= 0:
                mask[t] = True
            if int(end[i]) > i + 1:
                stack_end.append(int(end[i]))
                stack_state.append(s)
            i += 1
        return mask
