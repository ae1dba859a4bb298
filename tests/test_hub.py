"""HF token resolution parity (ref utils/tokens.rs get_token +
loaders/mod.rs TokenSource FromStr) — fully offline."""

import pytest

from mistralrs_tpu.utils.hub import get_token, parse_token_source, resolve_model_path


def test_token_source_parsing():
    assert parse_token_source("literal:abc") == ("literal", "abc")
    assert parse_token_source("env") == ("env", "HUGGING_FACE_HUB_TOKEN")
    assert parse_token_source("env:MY_TOKEN") == ("env", "MY_TOKEN")
    assert parse_token_source("path:/tmp/tok") == ("path", "/tmp/tok")
    assert parse_token_source("cache") == ("cache", None)
    assert parse_token_source("none") == ("none", None)
    with pytest.raises(ValueError):
        parse_token_source("literal")  # ref: "Expected a value for 'literal'"
    with pytest.raises(ValueError):
        parse_token_source("bogus:x")


def test_get_token_sources(tmp_path, monkeypatch):
    assert get_token("none") is None
    assert get_token("literal:sekrit") == "sekrit"
    monkeypatch.setenv("MY_HF_TOK", "fromenv")
    assert get_token("env:MY_HF_TOK") == "fromenv"
    monkeypatch.delenv("ABSENT_VAR", raising=False)
    assert get_token("env:ABSENT_VAR") is None  # warn + no token (ref :21)
    f = tmp_path / "tok"
    f.write_text("fromfile\n")
    assert get_token(f"path:{f}") == "fromfile"
    assert get_token("path:/definitely/missing") is None
    # cache: point HOME at tmp
    monkeypatch.setenv("HOME", str(tmp_path))
    cache = tmp_path / ".cache" / "huggingface"
    cache.mkdir(parents=True)
    (cache / "token").write_text("cached")
    assert get_token("cache") == "cached"


def test_resolve_local_passthrough(tmp_path):
    assert resolve_model_path(str(tmp_path)) == str(tmp_path)


def test_resolve_remote_errors_cleanly(monkeypatch):
    # zero-egress: a non-local id must raise the documented RuntimeError
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    with pytest.raises(RuntimeError, match="local model directory"):
        resolve_model_path("org/definitely-not-on-disk")
