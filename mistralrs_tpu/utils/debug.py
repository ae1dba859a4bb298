"""Debug logging + GGUF tensor dumps.

Reference parity: mistralrs-core/src/utils/debug.rs (`initialize_logging`:
DEBUG level when MISTRALRS_DEBUG=1 :11-27) and gguf/content.rs's
`mistralrs_gguf_tensors.txt` dump under the same flag.
"""

from __future__ import annotations

import logging
import os

DEBUG_ENV = "MISTRALRS_DEBUG"


def debug_enabled() -> bool:
    return os.environ.get(DEBUG_ENV, "0") not in ("", "0", "false")


def initialize_logging() -> None:
    """Set up root logging; DEBUG when MISTRALRS_DEBUG=1 (ref debug.rs)."""
    level = logging.DEBUG if debug_enabled() else logging.INFO
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )


def maybe_dump_gguf_tensors(gguf_file, path: str = "mistralrs_gguf_tensors.txt") -> None:
    """Write name/dtype/shape of every tensor when debug is on
    (ref gguf/content.rs MISTRALRS_DEBUG dump)."""
    if not debug_enabled():
        return
    with open(path, "w") as f:
        for name, info in sorted(gguf_file.tensors.items()):
            f.write(f"{name}\t{info.ggml_type.name}\t{tuple(info.shape)}\n")
    logging.getLogger(__name__).info("wrote GGUF tensor dump to %s", path)
