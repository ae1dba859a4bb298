"""JSON-schema -> .y grammar compilation (grammar/json_schema.py), checked
through the same Earley recognizer the server uses."""

import json

import pytest

from mistralrs_tpu.grammar.cfg import EarleyState, parse_yacc
from mistralrs_tpu.grammar.json_schema import schema_to_yacc


def _accepts(grammar, data) -> bool:
    st = EarleyState(grammar)
    for b in data if isinstance(data, bytes) else data.encode():
        if not st.push_byte(b):
            return False
    return st.accepting


def _grammar(schema):
    return parse_yacc(schema_to_yacc(schema))


def test_flat_object_required_and_optional():
    g = _grammar({
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tag": {"type": "string"},
        },
        "required": ["name", "age"],
    })
    assert _accepts(g, '{"name": "bo", "age": 3}')
    assert _accepts(g, '{"name": "bo", "age": 3, "tag": "x"}')
    assert not _accepts(g, '{"age": 3}')  # missing required name
    assert not _accepts(g, '{"age": 3, "name": "bo"}')  # order fixed
    assert not _accepts(g, '{"name": "bo", "age": "x"}')  # wrong type
    assert not _accepts(g, '{"name": "bo", "age": 3, "zz": 1}')  # unknown key


def test_all_optional_allows_empty():
    g = _grammar({"type": "object",
                  "properties": {"a": {"type": "integer"},
                                 "b": {"type": "boolean"}}})
    assert _accepts(g, "{}")
    assert _accepts(g, '{"a": 1}')
    assert _accepts(g, '{"b": true}')
    assert _accepts(g, '{"a": -2, "b": false}')
    assert not _accepts(g, '{"b": true, "a": 1}')


def test_nested_arrays_enums_refs():
    g = _grammar({
        "type": "object",
        "properties": {
            "kind": {"enum": ["cat", "dog", 3]},
            "pts": {"type": "array", "items": {"$ref": "#/$defs/pt"},
                    "minItems": 1, "maxItems": 2},
        },
        "required": ["kind", "pts"],
        "$defs": {
            "pt": {"type": "object",
                   "properties": {"x": {"type": "number"},
                                  "y": {"type": "number"}},
                   "required": ["x", "y"]},
        },
    })
    ok = '{"kind": "dog", "pts": [{"x": 1.5, "y": -2e3}]}'
    assert _accepts(g, ok)
    assert _accepts(g, '{"kind": 3, "pts": [{"x": 1, "y": 2}, {"x": 0, "y": 0}]}')
    assert not _accepts(g, '{"kind": "ox", "pts": [{"x": 1, "y": 2}]}')
    assert not _accepts(g, '{"kind": "dog", "pts": []}')  # minItems
    assert not _accepts(g, json.dumps({"kind": "dog", "pts": [
        {"x": 1, "y": 2}, {"x": 1, "y": 2}, {"x": 1, "y": 2}]}))  # maxItems


def test_string_escapes_and_unconstrained_value():
    g = _grammar({"type": "object",
                  "properties": {"s": {"type": "string"}, "v": {}},
                  "required": ["s", "v"]})
    assert _accepts(g, '{"s": "a\\"b\\u00e9", "v": {"z": [1, "q", null]}}')
    assert not _accepts(g, '{"s": "a\nb", "v": 1}')  # raw newline in string


def test_anyof_const_boolean_null():
    g = _grammar({"anyOf": [{"type": "null"},
                            {"const": 42},
                            {"type": "boolean"}]})
    for ok in ("null", "42", "true", "false"):
        assert _accepts(g, ok), ok
    assert not _accepts(g, "43")


def test_whitespace_skipping():
    g = _grammar({"type": "object",
                  "properties": {"a": {"type": "integer"}},
                  "required": ["a"]})
    assert _accepts(g, '{ "a" :\n\t7 }')


def test_engine_generates_schema_valid_json():
    """End-to-end: a real tiny model forced through the json-schema grammar
    emits parseable, schema-shaped JSON (byte-level vocab)."""
    import jax.numpy as jnp
    import torch
    import transformers as tf

    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.grammar.recognizer import Constraint
    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.loader import TensorSource, make_rope, params_from_source
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    torch.manual_seed(11)
    hf_cfg = tf.LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=256,
    )
    model = tf.LlamaForCausalLM(hf_cfg).eval().float()
    cfg = config_from_hf(json.loads(hf_cfg.to_json_string()))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_source(cfg, TensorSource.from_dict(sd), dtype=jnp.float32)
    pipe = TextPipeline(
        cfg, params, make_rope(cfg),
        PipelineConfig(page_size=4, num_pages=64, max_seqs=2, max_model_len=256,
                       prefill_buckets=(8, 16), dtype=jnp.float32),
    )
    vocab = [bytes([i]) if 32 <= i < 127 else b"" for i in range(128)]
    eng = Engine(pipe, eos_token_ids={0}, grammar_vocab=vocab)

    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"},
                       "n": {"type": "integer"},
                       "ok": {"type": "boolean"}},
        "required": ["name", "n"],
    }
    from mistralrs_tpu.grammar.json_schema import schema_to_yacc

    g = eng.add_request(GenerationRequest(
        [5, 6, 7], SamplingParams(max_len=120, temperature=1.0),
        constraint=Constraint.yacc(schema_to_yacc(schema)),
    ))
    steps = 0
    while eng.has_work:
        eng.step()
        steps += 1
        assert steps < 600
    text = b"".join(vocab[t] for t in g.seqs[0].generated_tokens).decode()
    # generation may hit max_len mid-object; it must at least be a valid
    # prefix — on eos-finish it must parse and carry the required keys
    if g.seqs[0].stop_reason is not None and g.seqs[0].stop_reason.value == "stop":
        obj = json.loads(text)
        assert isinstance(obj["name"], str) and isinstance(obj["n"], int)
    else:
        st = EarleyState(_grammar(schema))
        for byte in text.encode():
            assert st.push_byte(byte), (text,)


def test_server_response_format_parsing():
    from mistralrs_tpu.server.openai import OpenAIServer

    c = OpenAIServer._parse_constraint({
        "response_format": {"type": "json_schema", "json_schema": {
            "name": "out", "schema": {"type": "object", "properties": {
                "a": {"type": "integer"}}, "required": ["a"]}}},
    })
    assert c.kind == "yacc" and "root" in c.value
    g = parse_yacc(c.value)
    assert _accepts(g, '{"a": 7}') and not _accepts(g, '{"a": "x"}')

    c = OpenAIServer._parse_constraint({"response_format": {"type": "json_object"}})
    g2 = parse_yacc(c.value)
    assert _accepts(g2, '{"x": [1, true, "s"]}')
    assert not _accepts(g2, "true")  # json_object => an OBJECT, not a scalar

    c = OpenAIServer._parse_constraint({
        "grammar": {"type": "json_schema",
                    "value": json.dumps({"type": "boolean"})},
    })
    assert _accepts(parse_yacc(c.value), "true")


def test_schema_edge_cases_from_review():
    # propertyless object => any members, but still an object
    g = _grammar({"type": "object"})
    assert _accepts(g, '{"free": [1, 2]}') and _accepts(g, "{}")
    assert not _accepts(g, "5") and not _accepts(g, "true")
    # escaped trailing \$ in pattern survives anchor stripping
    g = _grammar({"type": "string", "pattern": "^price\\$$"})
    assert _accepts(g, '"price$"')
    assert not _accepts(g, '"price"')
    # required key missing from properties -> loud error
    with pytest.raises(ValueError, match="required properties"):
        _grammar({"type": "object", "properties": {"a": {"type": "integer"}},
                  "required": ["a", "b"]})
    # distinct $defs names that sanitize identically stay distinct
    g = _grammar({
        "type": "object",
        "properties": {"a": {"$ref": "#/$defs/x-y"}, "b": {"$ref": "#/$defs/x_y"}},
        "required": ["a", "b"],
        "$defs": {"x-y": {"type": "integer"}, "x_y": {"type": "string"}},
    })
    assert _accepts(g, '{"a": 1, "b": "s"}')
    assert not _accepts(g, '{"a": 1, "b": 2}')
    # maxItems beyond the unroll cap is enforced, not silently dropped
    g = _grammar({"type": "array", "items": {"type": "integer"},
                  "minItems": 1, "maxItems": 70})
    assert _accepts(g, "[" + ", ".join(["1"] * 70) + "]")
    assert not _accepts(g, "[" + ", ".join(["1"] * 71) + "]")
    assert not _accepts(g, "[]")
    with pytest.raises(ValueError, match="maxItems"):
        _grammar({"type": "array", "maxItems": 5000})
