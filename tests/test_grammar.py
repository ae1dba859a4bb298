"""Grammar-constrained decoding tests: regex DFA, token trie masks (native
C++ vs python parity), CFG/yacc recognizer, engine integration, tools."""

import json

import numpy as np
import pytest

from mistralrs_tpu.grammar import TokTrie, compile_regex, vocab_bytes
from mistralrs_tpu.grammar.cfg import CfgRecognizer, parse_yacc
from mistralrs_tpu.grammar.recognizer import Constraint, DfaRecognizer
from mistralrs_tpu.grammar.regex import DEAD


# ---------------------------------------------------------------- regex DFA
def _matches(dfa, s: bytes) -> bool:
    st = dfa.walk(dfa.start, s)
    return st != DEAD and bool(dfa.accept[st])


def _viable(dfa, s: bytes) -> bool:
    return dfa.walk(dfa.start, s) != DEAD


@pytest.mark.parametrize(
    "pattern,yes,no",
    [
        (r"abc", [b"abc"], [b"ab", b"abd", b"abcd"]),
        (r"a*b", [b"b", b"ab", b"aaab"], [b"a", b"ba"]),
        (r"a+", [b"a", b"aa"], [b"", b"b"]),
        (r"colou?r", [b"color", b"colour"], [b"colo", b"colouur"]),
        (r"(ab|cd)+", [b"ab", b"cdab"], [b"a", b"abc"]),
        (r"[0-9]{2,4}", [b"12", b"1234"], [b"1", b"12345"]),
        (r"[a-c]x", [b"ax", b"cx"], [b"dx"]),
        (r"[^a]b", [b"xb", b"0b"], [b"ab"]),
        (r"\d+\.\d+", [b"3.14"], [b"3.", b".14"]),
        (r"\w+@\w+", [b"a_1@b"], [b"@b"]),
        (r"a.c", [b"abc", b"a0c"], [b"a\nc"]),
        (r"\s", [b" ", b"\t"], [b"x"]),
        (r"x{3}", [b"xxx"], [b"xx", b"xxxx"]),
        (r"x{2,}", [b"xx", b"xxxxx"], [b"x"]),
        (r'"[^"]*"', [b'"hi"', b'""'], [b'"', b'"a']),
    ],
)
def test_regex_matches(pattern, yes, no):
    import re as _re

    dfa = compile_regex(pattern)
    for s in yes:
        assert _matches(dfa, s), (pattern, s)
        assert _re.fullmatch(pattern, s.decode(), _re.S), "test vector wrong"
    for s in no:
        assert not _matches(dfa, s), (pattern, s)


def test_regex_viability_prunes_dead_prefixes():
    dfa = compile_regex(r"yes|no")
    assert _viable(dfa, b"y") and _viable(dfa, b"n")
    assert not _viable(dfa, b"x")
    assert not _viable(dfa, b"ye0")


def test_regex_utf8_literals():
    dfa = compile_regex("héllo")
    assert _matches(dfa, "héllo".encode())
    assert not _matches(dfa, b"hello")


# ---------------------------------------------------------------- tok trie
VOCAB = [b"", b"a", b"b", b"ab", b"abc", b"bc", b"c", b"1", b"12", b"2", b" ", b"ab"]


def test_trie_mask_python_vs_native():
    trie = TokTrie(VOCAB)
    dfa = compile_regex(r"ab*c?")
    state = dfa.start
    py = trie._mask_py(dfa, state)
    from mistralrs_tpu.grammar.native import native_mask

    nat = native_mask(trie, dfa, state)
    assert nat is not None, "native kernel failed to build"
    np.testing.assert_array_equal(py, nat)


def test_trie_mask_semantics():
    trie = TokTrie(VOCAB)
    dfa = compile_regex(r"ab*c?")
    mask = trie.compute_mask(dfa, dfa.start)
    # viable continuations from start: a(1), ab(3), abc(4), and dup ab(11)
    want = {1, 3, 4, 11}
    assert set(np.nonzero(mask)[0]) == want


def test_trie_mask_mid_state():
    trie = TokTrie(VOCAB)
    dfa = compile_regex(r"\d\d")
    st = dfa.walk(dfa.start, b"1")
    mask = trie.compute_mask(dfa, st)
    assert set(np.nonzero(mask)[0]) == {7, 9}  # "1", "2" (single digits)


def test_dfa_recognizer_flow():
    trie = TokTrie(VOCAB)
    rec = DfaRecognizer(trie, compile_regex(r"ab+c"), VOCAB)
    assert rec.allowed(3)  # "ab"
    assert not rec.allowed(6)  # "c" alone
    assert rec.advance(3)  # consume "ab"
    assert not rec.eos_allowed
    assert rec.allowed(5)  # "bc" completes
    rec.advance(5)
    assert rec.eos_allowed


# ---------------------------------------------------------------- CFG/yacc
JSONISH = r"""
%start value
%%
SKIP : "/[ \t\r\n]+/" ;
value : object | array | STRING | NUMBER | "true" | "false" | "null" ;
object : "{" "}" | "{" members "}" ;
members : pair | members "," pair ;
pair : STRING ":" value ;
array : "[" "]" | "[" elements "]" ;
elements : value | elements "," value ;
STRING : '/"[^"]*"/' ;
NUMBER : "/-?[0-9]+(\.[0-9]+)?/" ;
"""


def _accepts(src: str, text: bytes) -> tuple[bool, bool]:
    """(alive after feeding, accepting)"""
    from mistralrs_tpu.grammar.cfg import EarleyState

    st = EarleyState(parse_yacc(src))
    for b in text:
        if not st.push_byte(b):
            return False, False
    return True, st.accepting


@pytest.mark.parametrize(
    "text,ok",
    [
        (b"{}", True),
        (b'{"a": 1}', True),
        (b'{"a": [1, 2.5, "x"], "b": {"c": null}}', True),
        (b"[true, false]", True),
        (b"  [ 1 , 2 ]  ", True),
        (b"-3.25", True),
        (b'"hi"', True),
        (b"{", False),  # incomplete: viable but not accepting
        (b"[1,]", None),  # dead
        (b"{a: 1}", None),  # unquoted key: dead
    ],
)
def test_cfg_json_grammar(text, ok):
    alive, acc = _accepts(JSONISH, text)
    if ok is True:
        assert alive and acc, text
    elif ok is False:
        assert alive and not acc, text
    else:
        assert not alive, text


def test_cfg_yacc_parse_errors():
    with pytest.raises(ValueError):
        parse_yacc("%start a\n%%\na : undefined_rule ;")


def test_cfg_recognizer_mask_and_advance():
    vocab = [b"", b"{", b"}", b'"a"', b":", b" ", b"1", b"{}", b"x"]
    trie = TokTrie(vocab)
    rec = CfgRecognizer.from_yacc(JSONISH, trie, vocab)
    mask = rec.mask()
    allowed = set(np.nonzero(mask)[0])
    assert 1 in allowed and 7 in allowed and 3 in allowed and 6 in allowed
    assert 2 not in allowed and 4 not in allowed and 8 not in allowed
    assert rec.advance(1)  # "{"
    assert not rec.eos_allowed
    assert rec.allowed(3) and rec.allowed(2)  # key or close
    assert rec.advance(2)  # "}"
    assert rec.eos_allowed


# ---------------------------------------------------------------- engine e2e
def _word_engine():
    """Tiny real model + word-level vocab where token i is the text 'w{i}'."""
    import jax.numpy as jnp
    import torch
    import transformers as tf

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    torch.manual_seed(3)
    hf_cfg = tf.LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=128,
    )
    model = tf.LlamaForCausalLM(hf_cfg).eval().float()
    cfg = config_from_hf(json.loads(hf_cfg.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    pipe = TextPipeline(
        cfg, params, make_rope(cfg),
        PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=128,
                       prefill_buckets=(8, 16), dtype=jnp.float32),
    )
    vocab = [f"w{i}".encode() for i in range(128)]
    return Engine(pipe, eos_token_ids={127}, grammar_vocab=vocab), vocab


def test_engine_regex_constraint_forces_shape():
    from mistralrs_tpu.engine.engine import GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams

    eng, vocab = _word_engine()
    # tokens must spell w1w2...: only tokens w1x allowed (w1, w10..w19, w100+)
    g = eng.add_request(GenerationRequest(
        [5, 6, 7], SamplingParams(max_len=4, temperature=0.9),
        constraint=Constraint.regex(r"(w1[0-9]*)+"),
    ))
    while eng.has_work:
        eng.step()
    toks = g.seqs[0].generated_tokens
    text = b"".join(vocab[t] for t in toks if t != 127).decode()
    import re as _re

    assert _re.fullmatch(r"(w1[0-9]*)*", text), text
    for t in toks:
        if t != 127:
            assert vocab[t].startswith(b"w1"), toks


def test_engine_constraint_greedy_sampler():
    """Argmax sampler + constraint: greedy fast path must be bypassed."""
    from mistralrs_tpu.engine.engine import GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams

    eng, vocab = _word_engine()
    g = eng.add_request(GenerationRequest(
        [5, 6, 7], SamplingParams(max_len=3),
        constraint=Constraint.regex(r"(w2[0-9]*)+"),
    ))
    while eng.has_work:
        eng.step()
    for t in g.seqs[0].generated_tokens:
        if t != 127:
            assert vocab[t].startswith(b"w2")


# ---------------------------------------------------------------- tools
def test_tool_matcher_single_and_array():
    from mistralrs_tpu.tools import ToolCallingMatcher, ToolChoice

    m = ToolCallingMatcher(ToolChoice("auto"))
    calls = m.get_calls('{"name": "get_weather", "parameters": {"city": "Paris"}}')
    assert len(calls) == 1 and calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Paris"}
    calls = m.get_calls('[{"name": "a", "parameters": {}}, {"name": "b", "parameters": {"x": 1}}]')
    assert [c.name for c in calls] == ["a", "b"]
    assert m.get_calls("just some text") == []
    assert m.get_calls('{"other": "json"}') == []


def test_tool_choice_filters():
    from mistralrs_tpu.tools import Tool, ToolCallingMatcher, ToolChoice

    tool = Tool.from_openai({"type": "function", "function": {"name": "b"}})
    m = ToolCallingMatcher(ToolChoice("tool", tool))
    calls = m.get_calls('[{"name": "a", "parameters": {}}, {"name": "b", "parameters": {}}]')
    assert [c.name for c in calls] == ["b"]
    none = ToolCallingMatcher(ToolChoice("none"))
    assert none.get_calls('{"name": "a", "parameters": {}}') == []


def test_vocab_bytes_handles_styles():
    from mistralrs_tpu.grammar.toktrie import token_bytes_from_str

    assert token_bytes_from_str("▁hello") == b" hello"
    assert token_bytes_from_str("<0x0A>") == b"\n"
    assert token_bytes_from_str("Ġworld") == b" world"  # byte-level BPE space
    assert token_bytes_from_str("abc") == b"abc"
