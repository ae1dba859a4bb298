"""Lazy g++ build + ctypes bindings for the trie-mask kernel.

The .so is compiled once into this directory on first use; any failure
(no compiler, read-only install) falls back to the numpy walker in
toktrie.py — behavior is identical, only slower.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "toktrie_mask.cpp")
_SO = os.path.join(_DIR, "libtoktrie.so")

_lib = None


def _build() -> "ctypes.CDLL | None":
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_SO)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.toktrie_mask.argtypes = [
            i32p, i32p, i32p, ctypes.c_int32, i32p, ctypes.c_int32, u8p,
        ]
        lib.toktrie_mask.restype = None
        lib.dfa_walk.argtypes = [i32p, ctypes.c_int32, u8p, ctypes.c_int32]
        lib.dfa_walk.restype = ctypes.c_int32
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_mask(trie, dfa, state: int) -> "np.ndarray | None":
    lib = _build()
    if lib is None:
        return None
    out = np.zeros(trie.vocab_size, np.uint8)
    table = np.ascontiguousarray(dfa.table, np.int32)
    lib.toktrie_mask(trie.byte, trie.token, trie.end, trie.n_nodes,
                     table, np.int32(state), out)
    return out.astype(bool)
