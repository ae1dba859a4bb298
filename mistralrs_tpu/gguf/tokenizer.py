"""GGUF-embedded tokenizer -> HF `tokenizers.Tokenizer` conversion.

Reference parity: mistralrs-core/src/gguf/gguf_tokenizer.rs
(`convert_gguf_to_hf_tokenizer` :75): `tokenizer.ggml.model` "llama"/"replit"
-> Unigram with Prepend(▁)/Replace normalizers and
Replace-ByteFallback-Fuse-Strip decoder chain; "gpt2" -> byte-level BPE.
Also GGUF-embedded chat template extraction (chat_template.rs:27).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _meta_list(md: dict[str, Any], key: str):
    v = md.get(key)
    if isinstance(v, np.ndarray):
        return v.tolist()
    return v


def convert_gguf_tokenizer(metadata: dict[str, Any]):
    """Build (TokenizerWrapper) from GGUF metadata."""
    from tokenizers import AddedToken, Tokenizer, decoders, models, normalizers, pre_tokenizers

    model = metadata.get("tokenizer.ggml.model")
    tokens = _meta_list(metadata, "tokenizer.ggml.tokens")
    if model is None or tokens is None:
        raise ValueError("GGUF has no embedded tokenizer")
    token_types = _meta_list(metadata, "tokenizer.ggml.token_type") or []
    bos_id = metadata.get("tokenizer.ggml.bos_token_id")
    eos_id = metadata.get("tokenizer.ggml.eos_token_id")
    unk_id = metadata.get("tokenizer.ggml.unknown_token_id")

    if model in ("llama", "replit"):
        scores = _meta_list(metadata, "tokenizer.ggml.scores")
        if scores is None:
            raise ValueError("unigram tokenizer missing tokenizer.ggml.scores")
        vocab = [(t, float(s)) for t, s in zip(tokens, scores)]
        tok = Tokenizer(models.Unigram(vocab, unk_id=int(unk_id) if unk_id is not None else 0,
                                       byte_fallback=True))
        tok.decoder = decoders.Sequence(
            [
                decoders.Replace("▁", " "),
                decoders.ByteFallback(),
                decoders.Fuse(),
                decoders.Strip(" ", 1, 0),
            ]
        )
        tok.normalizer = normalizers.Sequence(
            [normalizers.Prepend("▁"), normalizers.Replace(" ", "▁")]
        )
    elif model == "gpt2":
        merges_raw = _meta_list(metadata, "tokenizer.ggml.merges") or []
        merges = [tuple(m.split(" ", 1)) for m in merges_raw]
        vocab = {t: i for i, t in enumerate(tokens)}
        unk = tokens[int(unk_id)] if unk_id is not None else None
        tok = Tokenizer(models.BPE(vocab=vocab, merges=merges, unk_token=unk))
        tok.decoder = decoders.ByteLevel()
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    else:
        raise ValueError(f"unsupported GGUF tokenizer model {model!r}")

    # register special/control tokens (token_type 3 = control, 6 = byte? —
    # control tokens become special AddedTokens, matching the reference)
    special: list[AddedToken] = []
    if token_types:
        for i, tt in enumerate(token_types):
            if tt == 3:
                special.append(AddedToken(tokens[i], special=True, normalized=False))
    if special:
        tok.add_special_tokens(special)

    from mistralrs_tpu.utils.tokenizer import TokenizerWrapper

    eos_ids = {int(eos_id)} if eos_id is not None else set()
    return TokenizerWrapper(
        tok,
        bos_token=tokens[int(bos_id)] if bos_id is not None else None,
        eos_token=tokens[int(eos_id)] if eos_id is not None else None,
        chat_template=metadata.get("tokenizer.chat_template"),
        eos_token_ids=eos_ids,
    )
