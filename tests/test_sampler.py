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
