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

import functools

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

    def __init__(self, target: TextPipeline, draft: TextPipeline, gamma: int = 4,
                 spec_rounds: int = 1):
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
        # spec_rounds > 1: greedy rounds run the ON-DEVICE loop
        # (run_spec_multi — draft steps + verify + acceptance inside one
        # jitted scan); 1 = host-driven speculative_step only.
        self.spec_rounds = spec_rounds
        self._spec_multi_fn = None
        self.pc = tp
        self.cfg = target.cfg
        self.max_pages_per_seq = target.max_pages_per_seq

    # ------------------------------------------------------------- plumbing
    @property
    def last_greedy_pack(self):
        """Engine fast paths read the last step's device packs off the
        pipeline (batched prefill emission) — forward to the target."""
        return self.target.last_greedy_pack

    @property
    def last_topk_pack(self):
        return self.target.last_topk_pack

    @property
    def last_logits(self):
        return self.target.last_logits

    def fetch_full_logits_row(self, i: int):
        return self.target.fetch_full_logits_row(i)

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

    # --------------------------------------------- on-device greedy loop
    def spec_multi_ok(self, seqs: list[Sequence]) -> bool:
        """Device-loop eligibility: both models must be plain-forward
        pipelines (X-LoRA's dual pass opts out), and the in-scan draft
        catch-up feeds a static width of 2, which covers the steady-state
        gap (1 or 2); wider gaps (fresh preemption-recompute edge cases)
        take the host path this step and re-qualify next step."""
        return (getattr(self.target, "supports_spec_device_loop", False)
                and getattr(self.draft, "supports_spec_device_loop", False)
                and all(s.draft_kv_len >= len(s.tokens) - 2 for s in seqs))

    def _build_spec_multi_fn(self):
        """Model-draft analogue of PromptLookupPipeline's device loop: each
        round runs the gamma greedy draft steps (width-2 catch-up + gamma-1
        single-token feeds on the DRAFT model/cache), the width-(gamma+1)
        target verify, argmax-match acceptance and the counter rewinds —
        all inside one lax.scan over `spec_rounds` rounds (zero per-round
        host syncs; ref speculative.rs :309-617 runs this loop on the host).
        Greedy-only; emitted tokens are identical to plain greedy decoding.
        """
        import jax
        import jax.numpy as jnp

        from mistralrs_tpu.models.decoder import compute_logits, decoder_forward
        from mistralrs_tpu.ops.paged_attention import PagedAttnMeta

        tp, dp = self.target, self.draft
        ps = tp.pc.page_size
        g = self.gamma
        Wv = g + 1
        R = self.spec_rounds
        HCAP = 8  # device history: only the last <=2 tokens feed catch-up

        def fwd(pipe, params, cache, ids, pos0, widths, block_tables, kvl_end,
                active, pos_off):
            """One forward of `widths` tokens starting at per-row pos0."""
            W = ids.shape[1]
            pos = pos0[:, None] + jnp.arange(W)[None]
            page = jnp.take_along_axis(block_tables, pos // ps, axis=1)
            slot = page * ps + pos % ps
            meta = PagedAttnMeta(
                positions=pos + pos_off[:, None],
                slot_mapping=slot,
                block_tables=block_tables,
                kv_lens=kvl_end,
                active=active,
                head_major=pipe.head_major,
            )
            h, cache = decoder_forward(params, pipe.cfg, pipe.rope, ids,
                                       cache, meta)
            return compute_logits(params, pipe.cfg, h), cache

        @functools.partial(jax.jit, donate_argnums=(1, 3))
        def spec_multi(tparams, tcache, dparams, dcache, last2, kv_lens, dkv,
                       block_tables, active, pos_off):
            B = last2.shape[0]

            def body(carry, _):
                last2, kvl, dkv, tcache, dcache = carry
                # last2 [B, 2]: tokens at positions L-2, L-1 (L = kvl + 1)
                L = kvl + 1
                gap = L - dkv  # 1 or 2
                # ---- draft: catch-up feed (width 2) -> first proposal
                ids0 = jnp.where((gap == 1)[:, None], last2[:, 1:2].repeat(2, 1),
                                 last2)
                lg, dcache = fwd(dp, dparams, dcache, ids0, dkv, 2,
                                 block_tables, dkv + 2, active, pos_off)
                props = [jnp.take_along_axis(
                    jnp.argmax(lg, axis=-1).astype(jnp.int32),
                    (gap - 1)[:, None], axis=1)[:, 0]]
                # ---- draft: remaining gamma-1 single-token feeds
                for k in range(1, g):
                    lg, dcache = fwd(dp, dparams, dcache,
                                     props[-1][:, None], L + (k - 1), 1,
                                     block_tables, L + k, active, pos_off)
                    props.append(jnp.argmax(lg[:, 0], axis=-1).astype(jnp.int32))
                props = jnp.stack(props, axis=1)  # [B, g]
                # ---- target verify (width gamma+1)
                ids = jnp.concatenate([last2[:, 1:2], props], axis=1)
                lt, tcache = fwd(tp, tparams, tcache, ids, kvl, Wv,
                                 block_tables, kvl + Wv, active, pos_off)
                toks = jnp.argmax(lt, axis=-1).astype(jnp.int32)  # [B, Wv]
                vals = jnp.take_along_axis(lt, toks[..., None], axis=-1)[..., 0]
                match = toks[:, :g] == props
                acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                              axis=1)
                count = acc + 1
                # rewinds (ref :489-530 as counter arithmetic)
                new_dkv = L + jnp.minimum(acc, g - 1)
                new_kvl = kvl + count
                # last two tokens of the new sequence
                tprev = jnp.concatenate([last2[:, 1:2], toks], axis=1)
                last2 = jnp.concatenate([
                    jnp.take_along_axis(tprev, (count - 1)[:, None], axis=1),
                    jnp.take_along_axis(toks, (count - 1)[:, None], axis=1),
                ], axis=1)
                return ((last2, new_kvl, new_dkv, tcache, dcache),
                        (toks, vals, count, new_dkv))

            (_, _, _, tcache, dcache), (toks, vals, counts, dkvs) = \
                jax.lax.scan(body, (last2, kv_lens, dkv, tcache, dcache),
                             None, length=R)
            pack = jnp.concatenate(
                [toks.astype(jnp.float32), vals,
                 counts[..., None].astype(jnp.float32),
                 jnp.broadcast_to(jnp.float32(g), counts[..., None].shape),
                 dkvs[..., None].astype(jnp.float32)], axis=2)
            return pack, tcache, dcache

        return spec_multi

    def run_spec_multi(self, seqs: list[Sequence]) -> np.ndarray:
        """Device-loop rounds for the model draft: pack layout matches
        PromptLookupPipeline's plus the trailing draft_kv column
        ([R, n, 2*(gamma+1)+3]). kv_len/draft_kv_len advance on the host
        as the engine consumes."""
        if self._spec_multi_fn is None:
            self._spec_multi_fn = self._build_spec_multi_fn()
        import jax.numpy as jnp

        tp = self.target
        B = tp.pc.max_seqs
        ps = tp.pc.page_size
        R, g = self.spec_rounds, self.gamma
        bases = [tp._window_base_pages(s.kv_len) for s in seqs]
        width = tp._table_width(seqs, R * (g + 1), bases)
        last2 = np.zeros((B, 2), np.int32)
        kv_lens = np.zeros((B,), np.int32)
        dkv = np.zeros((B,), np.int32)
        pos_off = np.zeros((B,), np.int32)
        tables = np.zeros((B, width), np.int32)
        active = np.zeros((B,), np.float32)
        for i, (s, base) in enumerate(zip(seqs, bases)):
            last2[i] = (s.tokens[-2:] if len(s.tokens) >= 2
                        else [s.tokens[-1], s.tokens[-1]])
            kv_lens[i] = s.kv_len - base * ps
            dkv[i] = s.draft_kv_len - base * ps
            pos_off[i] = base * ps
            tables[i] = tp._tables_row(s, width, base)
            active[i] = 1.0
        pack, tp.cache, self.draft.cache = self._spec_multi_fn(
            tp.params, tp.cache, self.draft.params, self.draft.cache,
            jnp.asarray(last2), jnp.asarray(kv_lens), jnp.asarray(dkv),
            jnp.asarray(tables), jnp.asarray(active), jnp.asarray(pos_off))
        out = np.array(np.asarray(pack, np.float32)[:, : len(seqs)])
        # dkv came back window-relative; restore absolute per row
        out[:, :, 2 * (g + 1) + 2] += np.asarray(
            [b * ps for b in bases], np.float32)[None, : len(seqs)]
        return out

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

    def spec_multi_ok(self, seqs: list[Sequence]) -> bool:
        # no draft cache to catch up; target must be a plain-forward pipeline
        return getattr(self.target, "supports_spec_device_loop", False)

    def __init__(self, target: TextPipeline, gamma: int = 4,
                 ngram_max: int = 3, ngram_min: int = 1,
                 spec_rounds: int = 8, hist_cap: int = 1024):
        self.target = target
        self.draft = None
        self.gamma = gamma
        self.ngram_max = ngram_max
        self.ngram_min = ngram_min
        # on-device greedy spec loop: rounds per dispatch + device-history
        # capacity (run_spec_multi). spec_rounds <= 1 disables the device
        # loop (host-driven speculative_step only).
        self.spec_rounds = spec_rounds
        self.hist_cap = hist_cap
        self._spec_multi_fn = None
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

    # --------------------------------------------- on-device greedy loop
    def _build_spec_multi_fn(self):
        """The whole greedy speculative round — n-gram proposal from a
        device-resident token history, width-(gamma+1) target verify,
        argmax-match acceptance, history append, kv rewind — runs INSIDE a
        lax.scan over `spec_rounds` rounds, one dispatch total.

        Host-driven speculative decoding pays one device->host round-trip
        per round for the acceptance decision (20-50+ ms each through this
        host's tunnel, vs ~15 ms of device work); this loop removes every
        per-round sync, the speculative analogue of the multistep decode
        scan (pipeline/text.py _build_multistep_fn). Greedy-only: the
        verify pass's position-0 argmax IS the plain greedy token, so
        emitted tokens are identical to non-speculative greedy decoding
        regardless of proposal quality — acceptance only buys speed.

        KV rollback is the same counter rewind as the host path (ref
        speculative.rs :489-530 narrows tensors; here stale slots past the
        carried kv_len are simply never attended and are overwritten by
        the next round's verify writes at the rewound positions).
        """
        import jax
        import jax.numpy as jnp

        from mistralrs_tpu.models.decoder import compute_logits, decoder_forward
        from mistralrs_tpu.ops.paged_attention import PagedAttnMeta

        tp = self.target
        cfg, rope = tp.cfg, tp.rope
        ps = tp.pc.page_size
        hm = tp.head_major
        g = self.gamma
        Wv = g + 1
        R = self.spec_rounds
        HCAP = self.hist_cap
        n_min, n_max = self.ngram_min, self.ngram_max

        def propose(hist, hl):
            """Device mirror of _propose: longest-suffix n-gram match over
            the [B, HCAP] history. Returns (props [B, g], nprop [B]);
            rows without a match get nprop 0 (their garbage proposals are
            never accepted and their KV writes are overwritten)."""
            B = hist.shape[0]
            props = jnp.zeros((B, g), jnp.int32)
            nprop = jnp.zeros((B,), jnp.int32)
            for n in range(n_min, n_max + 1):  # ascending: larger n wins
                sidx = jnp.clip(hl[:, None] - n + jnp.arange(n)[None],
                                0, HCAP - 1)
                suffix = jnp.take_along_axis(hist, sidx, axis=1)  # [B, n]
                M = HCAP - n + 1
                ok = jnp.ones((B, M), bool)
                for i in range(n):
                    ok &= hist[:, i : i + M] == suffix[:, i : i + 1]
                # starts strictly before the suffix's own position
                ok &= jnp.arange(M)[None] < (hl - n)[:, None]
                last = jnp.max(jnp.where(ok, jnp.arange(M)[None], -1), axis=1)
                found = (last >= 0) & (hl >= n + 1)
                fs = last + n  # first following token
                gidx = jnp.clip(fs[:, None] + jnp.arange(g)[None], 0, HCAP - 1)
                cand = jnp.take_along_axis(hist, gidx, axis=1)
                ncand = jnp.minimum(g, hl - fs)
                props = jnp.where(found[:, None], cand, props)
                nprop = jnp.where(found, ncand, nprop)
            return props, nprop

        @functools.partial(jax.jit, donate_argnums=(1,))
        def spec_multi(params, cache, hist, hl, kv_lens, block_tables,
                       active, pos_off):
            def body(carry, _):
                hist, hl, kvl, cache = carry
                props, nprop = propose(hist, hl)
                last = jnp.take_along_axis(
                    hist, jnp.clip(hl - 1, 0, HCAP - 1)[:, None], axis=1)
                ids = jnp.concatenate([last, props], axis=1)  # [B, Wv]
                pos = kvl[:, None] + jnp.arange(Wv)[None]  # window-relative
                page = jnp.take_along_axis(block_tables, pos // ps, axis=1)
                slot = page * ps + pos % ps
                meta = PagedAttnMeta(
                    positions=pos + pos_off[:, None],
                    slot_mapping=slot,
                    block_tables=block_tables,
                    kv_lens=kvl + Wv,
                    active=active,
                    head_major=hm,
                )
                h, cache = decoder_forward(params, cfg, rope, ids, cache, meta)
                logits = compute_logits(params, cfg, h)  # [B, Wv, V]
                toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                vals = jnp.take_along_axis(
                    logits, toks[..., None], axis=-1)[..., 0]
                match = (toks[:, :g] == props) & (
                    jnp.arange(g)[None] < nprop[:, None])
                acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                              axis=1)
                count = acc + 1  # emitted tokens this round (1..Wv)
                # append ALL Wv verify outputs at hl; hl advances by count,
                # so rejected-tail garbage is overwritten next round
                hist = jax.vmap(
                    lambda h_, u, s: jax.lax.dynamic_update_slice(h_, u, (s,))
                )(hist, toks, hl)
                return ((hist, hl + count, kvl + count, cache),
                        (toks, vals, count, nprop))

            (_, _, _, cache), (toks, vals, counts, nprops) = jax.lax.scan(
                body, (hist, hl, kv_lens, cache), None, length=R)
            # ONE fetched pack [R, B, 2*Wv+2]: tokens, argmax logits, count,
            # n proposed (host round-trips cost 20-50+ ms each here)
            pack = jnp.concatenate(
                [toks.astype(jnp.float32), vals,
                 counts[..., None].astype(jnp.float32),
                 nprops[..., None].astype(jnp.float32)], axis=2)
            return pack, cache

        return spec_multi

    def run_spec_multi(self, seqs: list[Sequence]) -> np.ndarray:
        """`spec_rounds` greedy speculative rounds in one dispatch: returns
        pack [R, n, 2*(gamma+1)+2] = (tokens, argmax logits, emitted count,
        proposed count) per round. Does NOT advance kv_len — the engine
        adds exactly the tokens it consumes (stop conditions may cut a
        round short; the rewind is the usual counter trick).

        The device history holds the last `hist_cap - R*(gamma+1)` tokens
        of each sequence, so n-gram proposals only see that tail — same
        behavior as the host path on long contexts in practice (recent
        matches dominate; host `_propose` picks the MOST RECENT match)."""
        if self._spec_multi_fn is None:
            self._spec_multi_fn = self._build_spec_multi_fn()
        import jax.numpy as jnp

        tp = self.target
        B = tp.pc.max_seqs
        ps = tp.pc.page_size
        R, g = self.spec_rounds, self.gamma
        HCAP = self.hist_cap
        keep = HCAP - R * (g + 1)
        assert keep > 0, "hist_cap must exceed spec_rounds * (gamma + 1)"
        bases = [tp._window_base_pages(s.kv_len) for s in seqs]
        width = tp._table_width(seqs, R * (g + 1), bases)
        hist = np.zeros((B, HCAP), np.int32)
        hl = np.zeros((B,), np.int32)
        kv_lens = np.zeros((B,), np.int32)
        pos_off = np.zeros((B,), np.int32)
        tables = np.zeros((B, width), np.int32)
        active = np.zeros((B,), np.float32)
        for i, (s, base) in enumerate(zip(seqs, bases)):
            t = s.tokens[-keep:]
            hist[i, : len(t)] = t
            hl[i] = len(t)
            kv_lens[i] = s.kv_len - base * ps
            pos_off[i] = base * ps
            tables[i] = tp._tables_row(s, width, base)
            active[i] = 1.0
        pack, tp.cache = self._spec_multi_fn(
            tp.params, tp.cache, jnp.asarray(hist), jnp.asarray(hl),
            jnp.asarray(kv_lens), jnp.asarray(tables), jnp.asarray(active),
            jnp.asarray(pos_off))
        return np.asarray(pack, np.float32)[:, : len(seqs)]
