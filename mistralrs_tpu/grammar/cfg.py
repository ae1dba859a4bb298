"""Yacc-grammar constrained decoding (CFG recognizer).

Reference parity: mistralrs-core/src/aici/cfg.rs `CfgParser::from_yacc` +
lex.rs — accepts the same .y input format (`%start`, `%%`, rules
`lhs : alt | alt ;`, quoted terminals that are literals or `/regex/`
patterns, and the special `SKIP` rule whose terminals may appear between any
two lexemes). Different machinery: the reference builds an LALR table plus a
shared lexer DFA; we run a *scannerless byte-level Earley* recognizer —
terminals carry their own DFA state inside Earley items, so lexeme-boundary
ambiguity is handled by the chart instead of maximal munch, and any CFG is
accepted (no LALR conflicts). The chart is append-only, so the token-trie
walk's push/pop byte operations are cheap truncations.

Item encoding: (lhs, alt, dot, origin, scan) where scan is
  -1                      — between symbols (no scan in progress)
  int >= 0                — mid-terminal, DFA state of alt[dot]'s matcher
  ("skip", tid, state)    — mid-skip-lexeme
"""

from __future__ import annotations

import dataclasses
import re

import numpy as np

from mistralrs_tpu.grammar.regex import DEAD, DenseDFA, compile_regex

START_LHS = ""  # synthetic start production's lhs


def _literal_dfa(text: str) -> DenseDFA:
    """Exact byte-string matcher as a DenseDFA."""
    data = text.encode("utf-8")
    S = len(data) + 2  # dead + len+1 chain states
    table = np.zeros((S, 256), np.int32)
    accept = np.zeros(S, bool)
    for i, b in enumerate(data):
        table[i + 1, b] = i + 2
    accept[S - 1] = True
    return DenseDFA(table=table, accept=accept, start=1)


@dataclasses.dataclass
class Grammar:
    start: str
    prods: dict[str, list[tuple]]  # lhs -> alternatives; symbol = ("nt", name) | ("t", tid)
    terminals: list[DenseDFA]  # tid -> matcher
    skip_terminals: list[int]  # tids allowed between lexemes


def parse_yacc(src: str) -> Grammar:
    """Parse the .y subset the reference accepts (cfg.rs parse_yacc :91)."""
    src = re.sub(r"//[^\n]*", "", src)
    src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
    start = None
    m = re.search(r"%start\s+(\w+)", src)
    if m:
        start = m.group(1)
    body = src.split("%%", 1)[1] if "%%" in src else src
    body = re.sub(r"%\w+[^\n]*", "", body)

    terminals: list[DenseDFA] = []
    term_ids: dict[str, int] = {}

    def terminal(text: str) -> int:
        if text not in term_ids:
            if len(text) > 2 and text.startswith("/") and text.endswith("/"):
                # regex terminal: escapes belong to the regex compiler
                dfa = compile_regex(text[1:-1])
            else:
                lit = text
                if "\\" in lit:
                    lit = lit.encode("utf-8").decode("unicode_escape")
                dfa = _literal_dfa(lit)
            term_ids[text] = len(terminals)
            terminals.append(dfa)
        return term_ids[text]

    toks = re.findall(r"\"(?:\\.|[^\"])*\"|'(?:\\.|[^'])*'|[\w_]+|[:|;]", body)
    prods: dict[str, list[tuple]] = {}
    i = 0
    while i < len(toks):
        lhs = toks[i]
        if i + 1 >= len(toks) or toks[i + 1] != ":":
            raise ValueError(f"expected ':' after rule name {lhs!r}")
        i += 2
        alts: list[list] = [[]]
        while i < len(toks) and toks[i] != ";":
            t = toks[i]
            if t == "|":
                alts.append([])
            elif t[0] in "\"'":
                alts[-1].append(("t", terminal(t[1:-1])))
            else:
                alts[-1].append(("nt", t))
            i += 1
        i += 1  # skip ';'
        prods.setdefault(lhs, []).extend(tuple(a) for a in alts)

    if start is None:
        start = next(iter(prods))
    skip_tids = []
    if "SKIP" in prods:
        for alt in prods.pop("SKIP"):
            if len(alt) != 1 or alt[0][0] != "t":
                raise ValueError("SKIP alternatives must be single terminals")
            skip_tids.append(alt[0][1])
    missing = {
        name
        for alts in prods.values()
        for alt in alts
        for kind, name in alt
        if kind == "nt" and name not in prods
    }
    if missing:
        raise ValueError(f"undefined rules: {sorted(missing)}")
    if start not in prods:
        raise ValueError(f"%start rule {start!r} undefined")
    return Grammar(start=start, prods=prods, terminals=terminals, skip_terminals=skip_tids)


class EarleyState:
    """Append-only Earley chart over bytes (one row per byte consumed)."""

    def __init__(self, g: Grammar):
        self.g = g
        self.rows: list[frozenset] = []
        self.rows.append(
            self._close([(START_LHS, (("nt", g.start),), 0, 0, -1)], 0)
        )

    def _close(self, seed: list, row_index: int) -> frozenset:
        """Predict/complete fixpoint (with same-row completion handling)."""
        g = self.g
        row: set = set()
        agenda = list(seed)
        while agenda:
            item = agenda.pop()
            if item in row:
                continue
            row.add(item)
            lhs, alt, dot, origin, scan = item
            if scan != -1:
                continue  # mid-scan items only react to bytes
            if dot < len(alt):
                kind, val = alt[dot]
                if kind == "nt":
                    for a in g.prods[val]:
                        agenda.append((val, a, 0, row_index, -1))
                    # same-row completions that already finished `val`
                    for c in row:
                        if c[0] == val and c[2] >= len(c[1]) and c[3] == row_index and c[4] == -1:
                            agenda.append((lhs, alt, dot + 1, origin, -1))
                            break
                else:
                    dfa = g.terminals[val]
                    if dfa.accept[dfa.start]:  # nullable terminal
                        agenda.append((lhs, alt, dot + 1, origin, -1))
            else:
                # completion: advance waiting parents
                parents = self.rows[origin] if origin < row_index else row
                for p in list(parents):
                    plhs, palt, pdot, porigin, pscan = p
                    if (
                        pscan == -1
                        and pdot < len(palt)
                        and palt[pdot] == ("nt", lhs)
                    ):
                        agenda.append((plhs, palt, pdot + 1, porigin, -1))
        return frozenset(row)

    def push_byte(self, b: int) -> bool:
        g = self.g
        seed: list = []
        for lhs, alt, dot, origin, scan in self.rows[-1]:
            if scan == -1:
                if dot < len(alt) and alt[dot][0] == "t":
                    tid = alt[dot][1]
                    dfa = g.terminals[tid]
                    s2 = dfa.step(dfa.start, b)
                    if s2 != DEAD:
                        seed.append((lhs, alt, dot, origin, s2))
                        if dfa.accept[s2]:
                            seed.append((lhs, alt, dot + 1, origin, -1))
                # a skip lexeme may run before the next symbol (or trail the
                # completed start production)
                if (dot < len(alt)) or (lhs == START_LHS and dot >= len(alt)):
                    for tid in g.skip_terminals:
                        dfa = g.terminals[tid]
                        s2 = dfa.step(dfa.start, b)
                        if s2 != DEAD:
                            seed.append((lhs, alt, dot, origin, ("skip", tid, s2)))
                            if dfa.accept[s2]:
                                seed.append((lhs, alt, dot, origin, -1))
            elif isinstance(scan, tuple):  # mid-skip
                _, tid, s = scan
                dfa = g.terminals[tid]
                s2 = dfa.step(s, b)
                if s2 != DEAD:
                    seed.append((lhs, alt, dot, origin, ("skip", tid, s2)))
                    if dfa.accept[s2]:
                        seed.append((lhs, alt, dot, origin, -1))
            else:  # mid-terminal
                tid = alt[dot][1]
                dfa = g.terminals[tid]
                s2 = dfa.step(scan, b)
                if s2 != DEAD:
                    seed.append((lhs, alt, dot, origin, s2))
                    if dfa.accept[s2]:
                        seed.append((lhs, alt, dot + 1, origin, -1))
        if not seed:
            return False
        self.rows.append(self._close(seed, len(self.rows)))
        return True

    def pop_bytes(self, n: int) -> None:
        if n:
            del self.rows[len(self.rows) - n :]

    @property
    def accepting(self) -> bool:
        return any(
            lhs == START_LHS and dot >= len(alt) and origin == 0 and scan == -1
            for lhs, alt, dot, origin, scan in self.rows[-1]
        )


class CfgRecognizer:
    """Engine-facing recognizer (same surface as DfaRecognizer): allowed /
    advance / mask / eos_allowed, backed by the Earley chart."""

    def __init__(self, grammar: Grammar, trie, vocab: list[bytes]):
        self.g = grammar
        self.trie = trie
        self.vocab = vocab
        self.state = EarleyState(grammar)
        self._mask_cache: dict[int, np.ndarray] = {}

    @classmethod
    def from_yacc(cls, src: str, trie, vocab: list[bytes]) -> "CfgRecognizer":
        return cls(parse_yacc(src), trie, vocab)

    # -- queries
    def _try_bytes(self, bs: bytes) -> int:
        """Push bytes; return count actually pushed (all = success)."""
        n = 0
        for b in bs:
            if not self.state.push_byte(b):
                break
            n += 1
        return n

    def allowed(self, token: int) -> bool:
        bs = self.vocab[token] if 0 <= token < len(self.vocab) else b""
        if not bs:
            return False
        n = self._try_bytes(bs)
        ok = n == len(bs)
        self.state.pop_bytes(n)
        return ok

    def advance(self, token: int) -> bool:
        bs = self.vocab[token] if 0 <= token < len(self.vocab) else b""
        n = self._try_bytes(bs)
        if n != len(bs):
            self.state.pop_bytes(n)
            return False
        self._mask_cache.clear()
        return True

    def mask(self) -> np.ndarray:
        """Allowed-token mask via a DFS walk of the token trie with chart
        push/pop (ref toktree.rs compute_bias over Recognizer). Cached per
        chart length (the chart uniquely identifies the consumed prefix)."""
        key = len(self.state.rows)
        hit = self._mask_cache.get(key)
        if hit is not None:
            return hit
        trie = self.trie
        mask = np.zeros(trie.vocab_size, bool)
        byte, token, end = trie.byte, trie.token, trie.end
        i = 0
        depth = 0
        ends: list[int] = [trie.n_nodes]
        n_nodes = trie.n_nodes
        st = self.state
        while i < n_nodes:
            while i >= ends[-1]:
                ends.pop()
                st.pop_bytes(1)
                depth -= 1
            if not st.push_byte(int(byte[i])):
                i = int(end[i])
                continue
            t = int(token[i])
            if t >= 0:
                mask[t] = True
            if int(end[i]) > i + 1:
                ends.append(int(end[i]))
                depth += 1
            else:
                st.pop_bytes(1)
            i += 1
        st.pop_bytes(depth)
        for winner, dups in trie._dups.items():
            if mask[winner]:
                mask[dups] = True
        self._mask_cache[key] = mask
        return mask

    @property
    def eos_allowed(self) -> bool:
        return self.state.accepting

    @property
    def is_dead(self) -> bool:
        return len(self.state.rows[-1]) == 0
