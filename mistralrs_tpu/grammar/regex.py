"""Regex -> byte-level dense DFA, for constrained decoding.

Reference parity: mistralrs-core/src/aici/rx.rs `RecRx` builds a
regex_automata dense DFA and walks it byte-by-byte while scanning the token
trie. We compile our own: Thompson NFA -> subset-construction DFA over the
256 byte alphabet, with non-viable states (no path to an accepting state)
collapsed into a single dead state so trie subtrees prune in O(1).

Pattern semantics: fully anchored (the whole generation must match), like
the reference's constraint regexes. Supported syntax: literals, '.',
classes [...] (ranges, negation), escapes \\d \\D \\w \\W \\s \\S \\n \\r
\\t \\0 \\xNN and escaped punctuation, groups (...), alternation |,
postfix * + ? {m} {m,} {m,n}. Non-ASCII literals are UTF-8 expanded;
non-ASCII class ranges are rejected.
"""

from __future__ import annotations

import dataclasses

import numpy as np

DEAD = 0  # state 0 is the dead state in every DenseDFA


@dataclasses.dataclass
class DenseDFA:
    table: np.ndarray  # [S, 256] int32, table[DEAD] == DEAD
    accept: np.ndarray  # [S] bool
    start: int

    def step(self, state: int, byte: int) -> int:
        return int(self.table[state, byte])

    def walk(self, state: int, data: bytes) -> int:
        for b in data:
            state = int(self.table[state, b])
            if state == DEAD:
                return DEAD
        return state


# ------------------------------------------------------------------ parsing
class _Parser:
    """Recursive-descent regex parser producing an NFA fragment graph.

    NFA representation: states are ints; transitions `eps[state] -> [states]`
    and `edges[state] -> [(byteset, state)]` where byteset is a frozenset of
    ints (or a 256-bit numpy bool array).
    """

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0
        self.eps: list[list[int]] = []
        self.edges: list[list[tuple[np.ndarray, int]]] = []

    # -- state helpers
    def new_state(self) -> int:
        self.eps.append([])
        self.edges.append([])
        return len(self.eps) - 1

    def link_eps(self, a: int, b: int) -> None:
        self.eps[a].append(b)

    def link(self, a: int, byteset: np.ndarray, b: int) -> None:
        self.edges[a].append((byteset, b))

    # -- tokenizer helpers
    def peek(self) -> str | None:
        return self.p[self.i] if self.i < len(self.p) else None

    def take(self) -> str:
        c = self.p[self.i]
        self.i += 1
        return c

    # -- grammar
    def parse(self) -> tuple[int, int]:
        s, e = self.alternation()
        if self.i != len(self.p):
            raise ValueError(f"unexpected '{self.peek()}' at {self.i} in regex")
        return s, e

    def alternation(self) -> tuple[int, int]:
        frags = [self.concat()]
        while self.peek() == "|":
            self.take()
            frags.append(self.concat())
        if len(frags) == 1:
            return frags[0]
        s, e = self.new_state(), self.new_state()
        for fs, fe in frags:
            self.link_eps(s, fs)
            self.link_eps(fe, e)
        return s, e

    def concat(self) -> tuple[int, int]:
        s = self.new_state()
        cur = s
        while self.peek() is not None and self.peek() not in "|)":
            fs, fe = self.postfix()
            self.link_eps(cur, fs)
            cur = fe
        return s, cur

    def postfix(self) -> tuple[int, int]:
        s, e = self.atom()
        while True:
            c = self.peek()
            if c == "*":
                self.take()
                ns, ne = self.new_state(), self.new_state()
                self.link_eps(ns, s)
                self.link_eps(ns, ne)
                self.link_eps(e, s)
                self.link_eps(e, ne)
                s, e = ns, ne
            elif c == "+":
                self.take()
                ne = self.new_state()
                self.link_eps(e, s)
                self.link_eps(e, ne)
                e = ne
            elif c == "?":
                self.take()
                ns, ne = self.new_state(), self.new_state()
                self.link_eps(ns, s)
                self.link_eps(ns, ne)
                self.link_eps(e, ne)
                s, e = ns, ne
            elif c == "{":
                save = self.i
                rep = self._try_repeat()
                if rep is None:
                    self.i = save
                    break
                lo, hi = rep
                s, e = self._repeat_fragment(s, e, lo, hi)
            else:
                break
        return s, e

    def _try_repeat(self) -> tuple[int, int | None] | None:
        assert self.take() == "{"
        num = ""
        while self.peek() is not None and self.peek().isdigit():
            num += self.take()
        if not num:
            return None
        lo = int(num)
        if self.peek() == "}":
            self.take()
            return lo, lo
        if self.peek() != ",":
            return None
        self.take()
        num2 = ""
        while self.peek() is not None and self.peek().isdigit():
            num2 += self.take()
        if self.peek() != "}":
            return None
        self.take()
        return lo, (int(num2) if num2 else None)

    def _repeat_fragment(self, s, e, lo, hi):
        """Expand {lo,hi} by cloning the sub-NFA (simple and correct for the
        small counts used in constraint patterns)."""
        clones = []
        total = hi if hi is not None else lo + 1
        for _ in range(max(total, 1)):
            clones.append(self._clone(s, e))
        ns, ne = self.new_state(), self.new_state()
        cur = ns
        for idx in range(lo):
            cs, ce = clones[idx]
            self.link_eps(cur, cs)
            cur = ce
        if hi is None:
            # unbounded tail: loop the final clone
            cs, ce = clones[lo] if lo < len(clones) else self._clone(s, e)
            self.link_eps(cur, ne)
            self.link_eps(cur, cs)
            self.link_eps(ce, cs)
            self.link_eps(ce, ne)
        else:
            self.link_eps(cur, ne)
            for idx in range(lo, hi):
                cs, ce = clones[idx]
                self.link_eps(cur, cs)
                cur = ce
                self.link_eps(cur, ne)
        return ns, ne

    def _clone(self, s: int, e: int) -> tuple[int, int]:
        """Deep-copy the fragment reachable from s (up to e)."""
        mapping: dict[int, int] = {}
        stack = [s]
        seen = {s}
        while stack:
            st = stack.pop()
            mapping[st] = self.new_state()
            for nxt in self.eps[st]:
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
            for _, nxt in self.edges[st]:
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        for old, new in mapping.items():
            for nxt in self.eps[old]:
                self.eps[new].append(mapping[nxt])
            for bs, nxt in self.edges[old]:
                self.edges[new].append((bs, mapping[nxt]))
        if e not in mapping:  # e unreachable from s means empty fragment
            mapping[e] = self.new_state()
        return mapping[s], mapping[e]

    # -- atoms
    def atom(self) -> tuple[int, int]:
        c = self.peek()
        if c == "(":
            self.take()
            if self.p[self.i : self.i + 2] == "?:":
                self.i += 2
            s, e = self.alternation()
            if self.peek() != ")":
                raise ValueError("unbalanced ')'")
            self.take()
            return s, e
        if c == "[":
            return self._fragment(self._char_class())
        if c == ".":
            self.take()
            bs = np.ones(256, bool)
            bs[ord("\n")] = False
            return self._fragment(bs)
        if c == "\\":
            self.take()
            return self._escape_fragment(self.take())
        if c in "*+?{":
            raise ValueError(f"dangling '{c}' at {self.i}")
        self.take()
        return self._literal_fragment(c)

    def _literal_fragment(self, ch: str) -> tuple[int, int]:
        data = ch.encode("utf-8")
        s = self.new_state()
        cur = s
        for b in data:
            bs = np.zeros(256, bool)
            bs[b] = True
            nxt = self.new_state()
            self.link(cur, bs, nxt)
            cur = nxt
        return s, cur

    def _fragment(self, byteset: np.ndarray) -> tuple[int, int]:
        s, e = self.new_state(), self.new_state()
        self.link(s, byteset, e)
        return s, e

    _CLASSES = {
        "d": lambda: _mark(range(48, 58)),
        "D": lambda: ~_mark(range(48, 58)),
        "w": lambda: _mark(range(48, 58), range(65, 91), range(97, 123), [95]),
        "W": lambda: ~_mark(range(48, 58), range(65, 91), range(97, 123), [95]),
        "s": lambda: _mark([9, 10, 11, 12, 13, 32]),
        "S": lambda: ~_mark([9, 10, 11, 12, 13, 32]),
    }
    _ESCAPES = {"n": 10, "r": 13, "t": 9, "0": 0, "f": 12, "v": 11, "a": 7}

    def _escape_fragment(self, c: str) -> tuple[int, int]:
        if c in self._CLASSES:
            return self._fragment(self._CLASSES[c]())
        if c in self._ESCAPES:
            bs = np.zeros(256, bool)
            bs[self._ESCAPES[c]] = True
            return self._fragment(bs)
        if c == "x":
            hexs = self.take() + self.take()
            bs = np.zeros(256, bool)
            bs[int(hexs, 16)] = True
            return self._fragment(bs)
        if not c.isalnum():
            return self._literal_fragment(c)
        raise ValueError(f"unsupported escape \\{c}")

    def _class_escape(self, c: str) -> np.ndarray:
        if c in self._CLASSES:
            return self._CLASSES[c]()
        if c in self._ESCAPES:
            return _mark([self._ESCAPES[c]])
        if c == "x":
            return _mark([int(self.take() + self.take(), 16)])
        if not c.isalnum():
            b = c.encode("utf-8")
            if len(b) != 1:
                raise ValueError("non-ASCII escape in class")
            return _mark([b[0]])
        raise ValueError(f"unsupported class escape \\{c}")

    def _char_class(self) -> np.ndarray:
        assert self.take() == "["
        negate = self.peek() == "^"
        if negate:
            self.take()
        bs = np.zeros(256, bool)
        first = True
        while True:
            c = self.peek()
            if c is None:
                raise ValueError("unterminated class")
            if c == "]" and not first:
                self.take()
                break
            first = False
            lo = None
            if c == "\\":
                self.take()
                esc = self._class_escape(self.take())
                marked = np.flatnonzero(esc)
                if len(marked) != 1:
                    # multi-char class escape (\d, \w, ...): no range allowed
                    bs |= esc
                    continue
                lo = int(marked[0])  # single-byte escape: range endpoint ok
            else:
                self.take()
                lo_b = c.encode("utf-8")
                if len(lo_b) != 1:
                    raise ValueError("non-ASCII char in class")
                lo = lo_b[0]
            if self.peek() == "-" and self.i + 1 < len(self.p) and self.p[self.i + 1] != "]":
                self.take()
                hi_c = self.take()
                if hi_c == "\\":
                    esc = self._class_escape(self.take())
                    marked = np.flatnonzero(esc)
                    if len(marked) != 1:
                        raise ValueError("class-escape range endpoint must be a single byte")
                    hi = int(marked[0])
                else:
                    hi_b = hi_c.encode("utf-8")
                    if len(hi_b) != 1:
                        raise ValueError("non-ASCII range in class")
                    hi = hi_b[0]
                bs[lo : hi + 1] = True
            else:
                bs[lo] = True
        return ~bs if negate else bs


def _mark(*ranges) -> np.ndarray:
    bs = np.zeros(256, bool)
    for r in ranges:
        for b in r:
            bs[b] = True
    return bs


# ---------------------------------------------------------------- NFA -> DFA
def compile_regex(pattern: str, max_states: int = 20_000) -> DenseDFA:
    p = _Parser(pattern)
    start, end = p.parse()
    n = len(p.eps)

    # epsilon closures (iterative DFS per state set)
    def closure(states: frozenset[int]) -> frozenset[int]:
        out = set(states)
        stack = list(states)
        while stack:
            s = stack.pop()
            for nxt in p.eps[s]:
                if nxt not in out:
                    out.add(nxt)
                    stack.append(nxt)
        return frozenset(out)

    start_set = closure(frozenset([start]))
    dfa_of: dict[frozenset[int], int] = {}
    table_rows: list[np.ndarray] = []
    accept_flags: list[bool] = []
    order: list[frozenset[int]] = []

    def intern(ss: frozenset[int]) -> int:
        if ss not in dfa_of:
            if len(dfa_of) >= max_states:
                raise ValueError("regex too large (DFA state limit)")
            dfa_of[ss] = len(order)
            order.append(ss)
        return dfa_of[ss]

    intern(start_set)
    i = 0
    while i < len(order):
        ss = order[i]
        # aggregate outgoing byte edges
        row = np.full(256, -1, np.int64)
        # for each byte, union of targets
        targets: dict[int, set[int]] = {}
        for s in ss:
            for byteset, dst in p.edges[s]:
                for b in np.nonzero(byteset)[0]:
                    targets.setdefault(int(b), set()).add(dst)
        for b, dsts in targets.items():
            row[b] = intern(closure(frozenset(dsts)))
        table_rows.append(row)
        accept_flags.append(end in ss)
        i += 1

    S = len(order)
    raw = np.stack(table_rows)  # -1 = no transition
    accept = np.asarray(accept_flags)

    # viability: states that can reach an accepting state
    viable = accept.copy()
    changed = True
    while changed:
        changed = False
        for s in range(S):
            if viable[s]:
                continue
            nz = raw[s][raw[s] >= 0]
            if nz.size and viable[nz].any():
                viable[s] = True
                changed = True

    # final table with DEAD=0; remap viable states to 1..K
    remap = np.zeros(S, np.int64)
    k = 1
    for s in range(S):
        if viable[s]:
            remap[s] = k
            k += 1
    table = np.zeros((k, 256), np.int32)  # row 0 = dead, self-loops
    acc = np.zeros(k, bool)
    for s in range(S):
        if not viable[s]:
            continue
        r = raw[s]
        dst = np.where((r >= 0) & viable[np.clip(r, 0, S - 1)], remap[np.clip(r, 0, S - 1)], DEAD)
        table[remap[s]] = dst.astype(np.int32)
        acc[remap[s]] = accept[s]
    start_id = int(remap[0]) if viable[0] else DEAD
    return DenseDFA(table=table, accept=acc, start=start_id)
