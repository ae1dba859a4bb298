"""HF-hub model resolution: local dirs/files pass through, `hf:`-style ids
download via huggingface_hub when the environment allows network.

Reference parity: pipeline/paths.rs `get_model_paths` + the `get_paths!`
macros (pipeline/macros.rs) resolve an HF model id or local directory into
weight/tokenizer/config paths, and utils/tokens.rs `get_token` (:17-56)
reads the auth token from a `TokenSource` (loaders/mod.rs:172-205:
literal:<v> | env[:VAR] | path:<p> | cache | none). Token resolution is
fully offline-testable; the actual download path degrades with a clear
error in zero-egress environments.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

#: weight/config artifacts fetched for a model repo (ref get_paths! collects
#: safetensors shards + tokenizer/config/template files)
MODEL_PATTERNS = [
    "*.safetensors", "*.safetensors.index.json", "config.json",
    "generation_config.json", "tokenizer.json", "tokenizer_config.json",
    "tokenizer.model", "preprocessor_config.json", "processor_config.json",
    "chat_template.json",
]


def parse_token_source(s: str) -> tuple[str, str | None]:
    """Parse the reference's TokenSource string format
    (loaders/mod.rs:180-205): returns (kind, value)."""
    parts = s.split(":", 1)
    kind = parts[0]
    if kind == "literal":
        if len(parts) < 2:
            raise ValueError("Expected a value for 'literal'")
        return "literal", parts[1]
    if kind == "env":
        return "env", parts[1] if len(parts) > 1 else "HUGGING_FACE_HUB_TOKEN"
    if kind == "path":
        if len(parts) < 2:
            raise ValueError("Expected a value for 'path'")
        return "path", parts[1]
    if kind in ("cache", "none"):
        return kind, None
    raise ValueError("Invalid token source format")


def get_token(source: str = "cache") -> str | None:
    """Resolve an HF auth token; on failure logs and uses no token
    (ref utils/tokens.rs get_token :17-56)."""
    kind, value = parse_token_source(source)
    if kind == "none":
        return None
    if kind == "literal":
        return value
    if kind == "env":
        tok = os.environ.get(value)
        if tok is None:
            logger.info("Could not load token at %r, using no HF token.", value)
        return tok
    path = (
        value if kind == "path"
        else os.path.join(os.path.expanduser("~"), ".cache", "huggingface", "token")
    )
    try:
        with open(path) as f:
            return f.read().strip()
    except OSError:
        logger.info("Could not load token at %r, using no HF token.", path)
        return None


def resolve_model_path(model: str, *, token_source: str = "cache",
                       revision: str | None = None) -> str:
    """Local path -> returned as-is; otherwise treat as an HF model id and
    snapshot-download the serving artifacts (ref get_paths! /
    load_model_from_hf). Raises a clear error when the hub is unreachable
    (zero-egress deployments load from local directories)."""
    if os.path.exists(model):
        return model
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover - baked into this image
        raise RuntimeError(
            f"{model!r} is not a local path and huggingface_hub is "
            "unavailable; pass a local model directory"
        ) from e
    try:
        return snapshot_download(
            model, revision=revision, allow_patterns=MODEL_PATTERNS,
            token=get_token(token_source),
        )
    except Exception as e:
        raise RuntimeError(
            f"could not fetch {model!r} from the HF hub ({e}); in offline "
            "environments pass a local model directory"
        ) from e
