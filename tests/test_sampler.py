"""Sampler semantics tests (ref sampler.rs order: penalties -> processors ->
temp -> softmax -> top-k -> top-p -> min-p -> multinomial)."""

import numpy as np

from mistralrs_tpu.engine.sampler import Sampler, SamplingParams


def test_argmax_when_no_temperature():
    s = Sampler(SamplingParams())
    logits = np.array([0.1, 5.0, 0.2], np.float32)
    out = s.sample(logits, [], np.random.default_rng(0))
    assert out.token == 1
    assert out.logprob == 5.0  # raw logit, matching ref sample_argmax


def test_tiny_temperature_is_argmax():
    s = Sampler(SamplingParams(temperature=1e-9))
    out = s.sample(np.array([0.0, 1.0], np.float32), [], np.random.default_rng(0))
    assert out.token == 1


def test_penalties_shift_logits():
    p = SamplingParams(frequency_penalty=1.0, presence_penalty=0.5)
    s = Sampler(p)
    logits = np.array([2.0, 2.0, 2.0], np.float32)
    # token 1 appeared twice in context: logit -> 2 - 2*1.0 - 0.5 = -0.5
    out = s.sample(logits, [1, 1], np.random.default_rng(0))
    assert out.token in (0, 2)


def test_top_k_restricts_support():
    p = SamplingParams(temperature=1.0, top_k=2)
    s = Sampler(p)
    logits = np.array([10.0, 9.0, -10.0, -10.0], np.float32)
    rng = np.random.default_rng(0)
    toks = {s.sample(logits, [], rng).token for _ in range(50)}
    assert toks <= {0, 1}


def test_top_p_keeps_until_cumsum():
    p = SamplingParams(temperature=1.0, top_p=0.5)
    s = Sampler(p)
    # probs ~ [0.97, 0.02, ...] -> top_p=0.5 keeps only token 0 after the
    # cumsum-before rule (first token's cumsum-before = 0 < 0.5, second = 0.97)
    logits = np.array([5.0, 1.0, 0.0, -1.0], np.float32)
    rng = np.random.default_rng(0)
    toks = {s.sample(logits, [], rng).token for _ in range(30)}
    assert toks == {0}


def test_min_p_filters_low_probs():
    p = SamplingParams(temperature=1.0, top_p=0.999, min_p=0.5)
    s = Sampler(p)
    logits = np.array([5.0, 4.9, 0.0, 0.0], np.float32)
    rng = np.random.default_rng(0)
    toks = {s.sample(logits, [], rng).token for _ in range(50)}
    assert toks <= {0, 1}


def test_logits_bias():
    p = SamplingParams(logits_bias={2: 100.0})
    s = Sampler(p)
    out = s.sample(np.zeros(5, np.float32), [], np.random.default_rng(0))
    assert out.token == 2


def test_custom_logits_processor():
    def ban_token_zero(logits, ctx):
        logits = logits.copy()
        logits[0] = -1e9
        return logits

    p = SamplingParams(logits_processors=[ban_token_zero])
    s = Sampler(p)
    out = s.sample(np.array([10.0, 1.0], np.float32), [], np.random.default_rng(0))
    assert out.token == 1


def test_top_n_logprobs():
    p = SamplingParams(temperature=1.0, top_n_logprobs=2)
    s = Sampler(p)
    out = s.sample(np.array([3.0, 2.0, 1.0], np.float32), [], np.random.default_rng(0), True)
    assert out.top_logprobs is not None and len(out.top_logprobs) == 2
    assert out.top_logprobs[0].token == 0


def test_deterministic_with_seeded_rng():
    p = SamplingParams(temperature=1.0, top_k=10)
    logits = np.random.default_rng(1).standard_normal(100).astype(np.float32)
    a = [Sampler(p).sample(logits, [], np.random.default_rng(7)).token for _ in range(5)]
    b = [Sampler(p).sample(logits, [], np.random.default_rng(7)).token for _ in range(5)]
    assert a == b


def test_topk_pack_sampling_matches_full_distribution():
    """sample_from_topk must induce the same distribution as Sampler.sample
    over many draws (exactness of the K-candidate + tail-fallback scheme)."""
    from mistralrs_tpu.engine.sampler import (
        Sampler, SamplingParams, sample_from_topk, topk_eligible,
    )

    rng = np.random.default_rng(0)
    V, K = 200, 64
    logits = (rng.standard_normal(V) * 2).astype(np.float32)
    for params in (
        SamplingParams(temperature=0.8, top_k=20),
        SamplingParams(temperature=1.2, top_k=50, top_p=0.9),
        SamplingParams(temperature=0.7),  # untruncated: tail fallback path
        SamplingParams(temperature=0.9, top_k=10, top_p=0.8, min_p=0.05),
    ):
        s = Sampler(params)
        assert topk_eligible(s, False, K)
        # device-pack emulation
        y = logits / params.temperature
        m = float(y.max())
        z = float(np.exp(y - m).sum())
        order = np.argsort(-y, kind="stable")[:K]
        tv, ti = y[order], order
        n = 4000
        r1, r2 = np.random.default_rng(1), np.random.default_rng(2)
        c_full = np.zeros(V)
        c_pack = np.zeros(V)
        for _ in range(n):
            c_full[s.sample(logits, [], r1).token] += 1
            lp = sample_from_topk(s, tv, ti, m, z, r2)
            tok = lp.token if lp is not None else s.sample(logits, [], r2).token
            c_pack[tok] += 1
        # same support
        assert set(np.nonzero(c_pack)[0]) <= set(np.nonzero(c_full)[0]) | set(
            np.nonzero(c_pack)[0]
        )
        # total variation distance small
        tvd = 0.5 * np.abs(c_full / n - c_pack / n).sum()
        assert tvd < 0.08, (params, tvd)


def test_topk_pack_ineligible_cases():
    from mistralrs_tpu.engine.sampler import Sampler, SamplingParams, topk_eligible

    assert not topk_eligible(Sampler(SamplingParams()), False, 64)  # argmax
    assert not topk_eligible(
        Sampler(SamplingParams(temperature=0.7, frequency_penalty=0.1)), False, 64)
    assert not topk_eligible(
        Sampler(SamplingParams(temperature=0.7, logits_bias={3: 1.0})), False, 64)
    assert not topk_eligible(
        Sampler(SamplingParams(temperature=0.7, top_n_logprobs=100)), True, 64)
