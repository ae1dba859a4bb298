"""Token sampler with reference-exact semantics.

Reference parity: mistralrs-core/src/sampler.rs — pipeline order
(`Sampler::sample` :401-455): penalties -> custom logits processors ->
(argmax if no temperature) -> temperature -> softmax -> top-k -> top-p ->
min-p -> multinomial over the *unnormalized* clamped probs
(`sample_top_kp_min_p` :309-372); frequency/presence penalties count over the
full context (`apply_penalties` :374-399); logprob is log10 of the selected
prob; top-n logprobs from the sorted distribution.

Host-side numpy implementation — exact, deterministic (single engine-owned
Generator mirroring the reference's engine-global Isaac64 seeded rng,
engine/mod.rs:37,98). The greedy path is also available on device.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import numpy as np

# custom logits processor: (logits, context_tokens) -> logits
LogitsProcessor = Callable[[np.ndarray, Sequence[int]], np.ndarray]


@dataclasses.dataclass
class SamplingParams:
    """Ref: sampler.rs SamplingParams (:27-56)."""

    temperature: float | None = None
    top_k: int | None = None
    top_p: float | None = None
    min_p: float | None = None
    top_n_logprobs: int = 0
    frequency_penalty: float | None = None
    presence_penalty: float | None = None
    stop_strings: list[str] = dataclasses.field(default_factory=list)
    stop_token_ids: list[int] = dataclasses.field(default_factory=list)
    max_len: int | None = None
    logits_bias: dict[int, float] | None = None
    n_choices: int = 1
    logits_processors: list[LogitsProcessor] = dataclasses.field(default_factory=list)

    def __post_init__(self):
        # ref Sampler::new: temperature < 1e-7 means argmax
        if self.temperature is not None and self.temperature < 1e-7:
            self.temperature = None


@dataclasses.dataclass
class TopLogprob:
    token: int
    logprob: float
    bytes: str | None = None


@dataclasses.dataclass
class Logprobs:
    token: int
    logprob: float
    bytes: str | None = None
    top_logprobs: list[TopLogprob] | None = None


class Sampler:
    """Per-sequence sampler instance (ref builds one per Sequence)."""

    def __init__(self, params: SamplingParams):
        self.p = params

    def _apply_penalties(self, logits: np.ndarray, context: Sequence[int]) -> np.ndarray:
        p = self.p
        if p.frequency_penalty is None and p.presence_penalty is None:
            return logits
        freq = p.frequency_penalty or 0.0
        pres = p.presence_penalty or 0.0
        counts = np.bincount(
            np.asarray(context, dtype=np.int64), minlength=logits.shape[-1]
        ).astype(np.float32)[: logits.shape[-1]]
        return logits - counts * freq - (counts > 0).astype(np.float32) * pres

    def _processors(self, logits: np.ndarray, context: Sequence[int]) -> np.ndarray:
        p = self.p
        if p.logits_bias:
            logits = logits.copy()
            for tok, bias in p.logits_bias.items():
                if 0 <= tok < logits.shape[-1]:
                    logits[tok] += bias
        for proc in p.logits_processors:
            logits = proc(logits, context)
        return logits

    def sample(
        self,
        logits: np.ndarray,  # [V] float32
        context: Sequence[int],
        rng: np.random.Generator,
        return_logprobs: bool = False,
    ) -> Logprobs:
        p = self.p
        logits = self._apply_penalties(logits.astype(np.float32), context)
        logits = self._processors(logits, context)

        if p.temperature is None:
            tok = int(np.argmax(logits))
            # ref sample_argmax: logprob is the raw logit value of the token
            return Logprobs(token=tok, logprob=float(logits[tok]),
                            top_logprobs=self._top_from(logits) if return_logprobs else None)

        x = logits / p.temperature
        x = x - x.max()
        probs = np.exp(x)
        probs /= probs.sum()

        order = np.argsort(-probs, kind="stable")
        top_k = p.top_k if p.top_k and p.top_k > 0 else 0
        if top_k > 0 and top_k < probs.shape[-1]:
            probs[order[top_k:]] = 0.0
        top_p = p.top_p if p.top_p is not None else 1.0
        if 0.0 < top_p < 1.0:
            # ref: keep tokens until cumsum >= top_p, zero the rest
            cums = np.cumsum(probs[order])
            cut = cums - probs[order] >= top_p  # cumsum *before* adding this token
            probs[order[cut]] = 0.0
            min_p = p.min_p if p.min_p is not None else 0.0
            if 0.0 < min_p < 1.0:
                max_p = probs[order[0]]
                probs[probs <= max_p * min_p] = 0.0

        total = probs.sum()
        if total <= 0:  # degenerate: fall back to best token
            tok = int(order[0])
            return Logprobs(token=tok, logprob=0.0,
                            top_logprobs=self._top_from_probs(probs, order) if return_logprobs else None)
        tok = int(rng.choice(probs.shape[-1], p=probs / total))
        # ref sample_multinomial: log10 of the (unnormalized) clamped prob
        lp = float(np.log10(probs[tok])) if probs[tok] > 0 else float("-inf")
        return Logprobs(
            token=tok, logprob=lp,
            top_logprobs=self._top_from_probs(probs, order) if return_logprobs else None,
        )

    def probs(self, logits: np.ndarray, context: Sequence[int]) -> np.ndarray | None:
        """Normalized distribution after the full processing pipeline
        (penalties -> processors -> temperature -> softmax -> top-k/p/min-p),
        for speculative rejection sampling (ref speculative.rs :471-487 +
        sampler.rs sample_speculative). Returns None on the argmax path."""
        p = self.p
        if p.temperature is None:
            return None
        logits = self._apply_penalties(logits.astype(np.float32), context)
        logits = self._processors(logits, context)
        x = logits / p.temperature
        x = x - x.max()
        probs = np.exp(x)
        probs /= probs.sum()
        order = np.argsort(-probs, kind="stable")
        top_k = p.top_k if p.top_k and p.top_k > 0 else 0
        if top_k > 0 and top_k < probs.shape[-1]:
            probs[order[top_k:]] = 0.0
        top_p = p.top_p if p.top_p is not None else 1.0
        if 0.0 < top_p < 1.0:
            cums = np.cumsum(probs[order])
            cut = cums - probs[order] >= top_p
            probs[order[cut]] = 0.0
            min_p = p.min_p if p.min_p is not None else 0.0
            if 0.0 < min_p < 1.0:
                max_p = probs[order[0]]
                probs[probs <= max_p * min_p] = 0.0
        total = probs.sum()
        if total <= 0:
            probs[:] = 0.0
            probs[order[0]] = 1.0
            return probs
        return probs / total

    def _top_from(self, logits: np.ndarray) -> list[TopLogprob]:
        n = self.p.top_n_logprobs
        if n <= 0:
            return []
        order = np.argsort(-logits, kind="stable")[:n]
        return [TopLogprob(int(t), float(logits[t])) for t in order]

    def _top_from_probs(self, probs: np.ndarray, order: np.ndarray) -> list[TopLogprob]:
        n = self.p.top_n_logprobs
        if n <= 0:
            return []
        sel = order[:n]
        out = []
        for t in sel:
            pv = probs[t]
            out.append(TopLogprob(int(t), float(np.log10(pv)) if pv > 0 else float("-inf")))
        return out


def sample_batch(
    samplers: list[Sampler],
    logits: np.ndarray,  # [B, V]
    contexts: list[Sequence[int]],
    rng: np.random.Generator,
    return_logprobs: list[bool] | None = None,
) -> list[Logprobs]:
    """Sample one token per row (ref sampling.rs sample_and_add_toks)."""
    out = []
    for i, s in enumerate(samplers):
        rl = return_logprobs[i] if return_logprobs else False
        out.append(s.sample(logits[i], contexts[i], rng, rl))
    return out
