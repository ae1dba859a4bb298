"""Speculative decoding: draft model proposes gamma tokens, target verifies.

Reference parity: mistralrs-core/src/pipeline/speculative.rs —
`SpeculativePipeline::step` (:309-617): gamma draft steps, one target pass
over the gamma+1 span, rejection sampling (acceptance :480-487), KV-cache
rollback (:489-530) and `SpeculativeConfig{gamma}` (:170-175).

TPU-native differences:
- The reference narrows K/V tensors to roll back rejected tokens; with the
  paged cache rollback is a *counter rewind* (seq.kv_len / seq.draft_kv_len):
  stale slots past kv_len are never attended (SURVEY.md §7 hard part 5).
- Draft and target share one page-id space (same page geometry), so a single
  BlockManager/block table serves both models' physically separate caches.
- The target's verify pass is one static-shape [B, gamma+1] jit call whose
  per-position logits come back in a single transfer; the all-greedy path
  fetches only the [2, B, gamma+1] on-device argmax pack.

Acceptance: standard speculative sampling — accept draft token d with
probability min(1, p_target(d)/p_draft(d)); on rejection resample from
normalize(max(p_target - p_draft, 0)); if all gamma accepted, sample the
bonus token from the target's last-position distribution. The greedy path
(temperature None) degenerates to exact argmax-match acceptance, keeping
output identical to non-speculative greedy decoding.
"""

from __future__ import annotations

import numpy as np

from mistralrs_tpu.engine.sampler import Logprobs
from mistralrs_tpu.engine.sequence import Sequence
from mistralrs_tpu.pipeline.text import TextPipeline

_TINY = 1e-10


def _log10(x: float) -> float:
    return float(np.log10(x)) if x > 0 else float("-inf")


class SpeculativePipeline:
    """Wraps (target, draft) TextPipelines; engine-facing surface matches
    TextPipeline plus `speculative_step` (ref SpeculativeConfig :170)."""

    is_speculative = True

    def __init__(self, target: TextPipeline, draft: TextPipeline, gamma: int = 4):
        tp, dp = target.pc, draft.pc
        assert tp.page_size == dp.page_size, "draft/target page size must match"
        assert tp.num_pages == dp.num_pages, "draft/target page count must match"
        assert tp.max_model_len == dp.max_model_len
        assert target.cfg.vocab_size == draft.cfg.vocab_size, (
            "speculative decoding requires a shared vocabulary "
            "(ref speculative.rs tokenizer check)"
        )
        self.target = target
        self.draft = draft
        self.gamma = gamma
        self.pc = tp
        self.cfg = target.cfg
        self.max_pages_per_seq = target.max_pages_per_seq

    # ------------------------------------------------------------- plumbing
    def apply_copies(self, ops: list[tuple[int, int]]) -> None:
        self.target.apply_copies(ops)
        self.draft.apply_copies(ops)

    def run_prefill_chunk(self, seq: Sequence, chunk: list[int], greedy: bool = False):
        # draft prefills the same chunk into its own cache (same pages/positions)
        self.draft.run_prefill_chunk(seq, chunk, greedy=True, advance_state=False)
        out = self.target.run_prefill_chunk(seq, chunk, greedy=greedy)
        seq.draft_kv_len = seq.prefill_done_tokens
        return out

    def run_decode(self, seqs: list[Sequence], greedy: bool = False):
        # non-speculative fallback on the target (unused by the engine, which
        # routes decode through speculative_step)
        return self.target.run_decode(seqs, greedy=greedy)

    # ------------------------------------------------------------- the step
    def _effective_gamma(self, seq: Sequence) -> int:
        """Clamp the draft span so no KV write lands past physical capacity
        and no more tokens are drafted than the sequence can still emit."""
        L = len(seq.tokens)
        phys_max = self.max_pages_per_seq * self.pc.page_size
        cap = min(self.gamma, phys_max - L, seq.max_model_len - L)
        if seq.sampling.max_len is not None:
            cap = min(cap, seq.sampling.max_len - seq.num_generated - 1)
        return max(0, cap)

    def speculative_step(
        self, seqs: list[Sequence], rng_for, greedy: bool
    ) -> list[list[Logprobs]]:
        """One engine decode step: returns per-seq emitted Logprobs (1 to
        gamma+1 tokens each). Updates kv_len/draft_kv_len; the engine appends
        the tokens and evaluates stop conditions."""
        g = self.gamma
        tables = [self.target._tables_row(s) for s in seqs]
        gis = [self._effective_gamma(s) for s in seqs]
        for s in seqs:
            assert s.kv_len == len(s.tokens) - 1, "decode invariant"

        # ---- 1. draft proposals ------------------------------------------
        proposals: list[list[int]] = [[] for _ in seqs]
        qdists: list[list[np.ndarray | None]] = [[] for _ in seqs]
        live = [i for i, gi in enumerate(gis) if gi > 0]
        if live:
            # catch-up + first proposal: feed tokens[draft_kv : L] (width 1,
            # or 2 right after a fully-accepted span)
            wc = max(len(seqs[i].tokens) - seqs[i].draft_kv_len for i in live)
            rows = []
            for i in live:
                s = seqs[i]
                rows.append((s.tokens[s.draft_kv_len :], s.draft_kv_len, tables[i]))
            out = self.draft.run_span(rows, wc, greedy=greedy)
            self._collect_draft(out, seqs, live, proposals, qdists, rng_for, greedy)
            for i in live:
                seqs[i].draft_kv_len = len(seqs[i].tokens)
            # remaining gamma-1 proposals: single-token feeds
            for k in range(1, max(gis)):
                step_live = [i for i in live if gis[i] > k]
                if not step_live:
                    break
                rows = []
                for i in step_live:
                    s = seqs[i]
                    pos = len(s.tokens) - 1 + k
                    rows.append(([proposals[i][k - 1]], pos, tables[i]))
                out = self.draft.run_span(rows, 1, greedy=greedy)
                self._collect_draft(out, seqs, step_live, proposals, qdists, rng_for, greedy)
            for i in live:
                seqs[i].spec_proposed += len(proposals[i])

        return self._verify_and_accept(seqs, tables, proposals, qdists, gis,
                                       rng_for, greedy, update_draft=True)

    def _verify_and_accept(self, seqs, tables, proposals, qdists, gis,
                           rng_for, greedy, update_draft):
        """Steps 2-3 of the speculative step, shared with the draftless
        prompt-lookup variant: one target verify pass over
        [last_token, d_0..d_{gi-1}] then acceptance + kv_len rewind."""
        g = self.gamma
        rows = []
        for i, s in enumerate(seqs):
            rows.append(([s.tokens[-1]] + proposals[i], s.kv_len, tables[i]))
        out = self.target.run_span(rows, g + 1, all_positions=True, greedy=greedy)

        results: list[list[Logprobs]] = []
        for i, s in enumerate(seqs):
            L = len(s.tokens)
            gi = gis[i]
            if greedy:
                toks = out[0, i].astype(np.int64)  # [g+1] argmax per position
                vals = out[1, i]
                emitted = []
                for j in range(gi):
                    tok = int(toks[j])
                    emitted.append(Logprobs(token=tok, logprob=float(vals[j])))
                    if tok != proposals[i][j]:
                        break
                else:
                    emitted.append(Logprobs(token=int(toks[gi]), logprob=float(vals[gi])))
                a = len(emitted) - 1
            else:
                logits = out[i]  # [g+1, V] f32
                emitted, a = self._reject_sample(s, logits, proposals[i], qdists[i], gi, rng_for(s))
            s.spec_accepted += a
            s.kv_len = L + a  # rollback = counter rewind (ref :489-530)
            if update_draft and gi > 0:
                # draft cache holds entries through position L+gi-2; keep only
                # the prefix consistent with the accepted tokens
                s.draft_kv_len = min(L + a, L + gi - 1)
            results.append(emitted)
        return results

    def _collect_draft(self, out, seqs, idxs, proposals, qdists, rng_for, greedy) -> None:
        """Extract one proposal per live row from a draft run_span output."""
        if greedy:
            for r, i in enumerate(idxs):
                proposals[i].append(int(out[0, r]))
                qdists[i].append(None)
        else:
            for r, i in enumerate(idxs):
                s = seqs[i]
                ctx = s.tokens + proposals[i]
                q = s.sampler.probs(out[r], ctx)
                if q is None:
                    # argmax-mode sampler: propose greedily, verify greedily
                    logits = s.sampler._processors(
                        s.sampler._apply_penalties(out[r].astype(np.float32), ctx), ctx
                    )
                    proposals[i].append(int(np.argmax(logits)))
                    qdists[i].append(None)
                else:
                    tok = int(rng_for(s).choice(q.shape[-1], p=q))
                    proposals[i].append(tok)
                    qdists[i].append(q)

    def _reject_sample(self, s, logits, props, qd, gi, rng):
        """Classic speculative acceptance (ref speculative.rs :471-487 adapted
        to stochastic sampling). Returns (emitted Logprobs, accepted count)."""
        ctx = list(s.tokens)
        emitted: list[Logprobs] = []
        sampler = s.sampler
        for j in range(gi):
            d = props[j]
            p = sampler.probs(logits[j], ctx)
            q = qd[j]
            if p is None:
                # greedy target: accept iff argmax matches the draft token
                pl = sampler._processors(
                    sampler._apply_penalties(logits[j].astype(np.float32), ctx), ctx
                )
                tok = int(np.argmax(pl))
                emitted.append(Logprobs(token=tok, logprob=float(pl[tok])))
                if tok != d:
                    return emitted, j
                ctx.append(d)
                continue
            if q is not None and rng.random() <= p[d] / max(q[d], _TINY):
                emitted.append(Logprobs(token=d, logprob=_log10(p[d])))
                ctx.append(d)
                continue
            if q is None:
                # greedy draft, stochastic target: treat q as a point mass at d
                if rng.random() <= p[d]:
                    emitted.append(Logprobs(token=d, logprob=_log10(p[d])))
                    ctx.append(d)
                    continue
                res = p.copy()
                res[d] = 0.0
            else:
                res = np.maximum(p - q, 0.0)
            tot = res.sum()
            dist = res / tot if tot > 0 else p
            tok = int(rng.choice(dist.shape[-1], p=dist))
            emitted.append(Logprobs(token=tok, logprob=_log10(p[tok])))
            return emitted, j
        # all gi accepted: bonus token from the target's last position
        p = sampler.probs(logits[gi], ctx)
        if p is None:
            pl = sampler._processors(
                sampler._apply_penalties(logits[gi].astype(np.float32), ctx), ctx
            )
            tok = int(np.argmax(pl))
            emitted.append(Logprobs(token=tok, logprob=float(pl[tok])))
        else:
            tok = int(rng.choice(p.shape[-1], p=p))
            emitted.append(Logprobs(token=tok, logprob=_log10(p[tok])))
        return emitted, gi


class PromptLookupPipeline(SpeculativePipeline):
    """Prompt-lookup (n-gram) speculative decoding: proposals come from the
    sequence's OWN tokens instead of a draft model — the longest recent
    n-gram suffix match proposes the tokens that followed it last time.
    Free draft (no second model, no draft KV), big accept rates on
    extraction/summarization/code-edit workloads. No reference equivalent
    (mistral.rs only supports model drafts, speculative.rs :170-175); the
    verify/acceptance math is inherited unchanged, with the draft treated
    as a point mass (q = one-hot) exactly like a greedy model draft.
    """

    # the target's prefill fast paths survive intact (no draft shadowing)
    supports_batched_prefill = True

    def __init__(self, target: TextPipeline, gamma: int = 4,
                 ngram_max: int = 3, ngram_min: int = 1):
        self.target = target
        self.draft = None
        self.gamma = gamma
        self.ngram_max = ngram_max
        self.ngram_min = ngram_min
        self.pc = target.pc
        self.cfg = target.cfg
        self.max_pages_per_seq = target.max_pages_per_seq

    def apply_copies(self, ops: list[tuple[int, int]]) -> None:
        self.target.apply_copies(ops)

    def run_prefill_chunk(self, seq: Sequence, chunk: list[int], greedy: bool = False):
        return self.target.run_prefill_chunk(seq, chunk, greedy=greedy)

    def run_prefill_chunks(self, items) -> None:
        return self.target.run_prefill_chunks(items)

    def _propose(self, tokens: list[int], gi: int) -> list[int]:
        """Longest-suffix n-gram match: for n = ngram_max..ngram_min, find
        the most recent earlier occurrence of tokens[-n:] and propose up to
        gi tokens that followed it. Vectorized over the history (O(n*L) in
        C, not Python) so 100k-token contexts stay sub-ms."""
        L = len(tokens)
        arr = np.asarray(tokens, dtype=np.int64)
        for n in range(min(self.ngram_max, L - 1), self.ngram_min - 1, -1):
            suffix = arr[L - n :]
            # candidate starts 0..L-n-1 (excludes the suffix's own position);
            # every match has >= 1 following token by construction
            ok = arr[0 : L - n] == suffix[0]
            for j in range(1, n):
                ok &= arr[j : j + L - n] == suffix[j]
            idx = np.nonzero(ok)[0]
            if idx.size:
                start = int(idx[-1])  # most recent occurrence
                return tokens[start + n : start + n + gi]
        return []

    def speculative_step(
        self, seqs: list[Sequence], rng_for, greedy: bool
    ) -> list[list[Logprobs]]:
        tables = [self.target._tables_row(s) for s in seqs]
        gis = [self._effective_gamma(s) for s in seqs]
        for s in seqs:
            assert s.kv_len == len(s.tokens) - 1, "decode invariant"

        # ---- 1. host-side n-gram proposals (no device work) --------------
        proposals: list[list[int]] = []
        for i, s in enumerate(seqs):
            props = self._propose(s.tokens, gis[i]) if gis[i] > 0 else []
            gis[i] = len(props)
            proposals.append(props)
            s.spec_proposed += len(props)

        # ---- 2+3. shared verify + acceptance (point-mass draft) ----------
        qdists = [[None] * gi for gi in gis]
        return self._verify_and_accept(seqs, tables, proposals, qdists, gis,
                                       rng_for, greedy, update_draft=False)
