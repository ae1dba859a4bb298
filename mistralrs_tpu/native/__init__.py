"""Native (C++) runtime components, built lazily with g++ + ctypes.

The reference implements its serving runtime (block engine, schedulers,
allocator) in native code; the performance-relevant mechanism here — the
paged block allocator consulted on every scheduler step — is C++
(runtime.cpp), with the pure-Python implementation kept as a behavioral
reference and fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "runtime.cpp")
_SO = os.path.join(_DIR, "libruntime.so")

_lib = None
_tried = False


def runtime_lib() -> "ctypes.CDLL | None":
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MISTRALRS_NATIVE", "1") in ("0", "false"):
        return None
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=180,
            )
        lib = ctypes.CDLL(_SO)
        c = ctypes
        i32, i64, f64, p = c.c_int32, c.c_int64, c.c_double, c.c_void_p
        i32p = c.POINTER(c.c_int32)
        sigs = {
            "bm_new": ([i32, i32, f64], p),
            "bm_delete": ([p], None),
            "bm_num_free": ([p], i32),
            "bm_can_allocate": ([p, i64, i32], i32),
            "bm_allocate": ([p, i64, i32], i32),
            "bm_can_append": ([p, i64, i32, i32], i32),
            "bm_append_slots": ([p, i64, i32, i32], i64),
            "bm_free_seq": ([p, i64], None),
            "bm_release_prefix": ([p, i64, i32], None),
            "bm_table_len": ([p, i64], i32),
            "bm_get_table": ([p, i64, i32p], None),
            "bm_share_prefix": ([p, i64, i32p, i32], None),
            "bm_share_prefix_released": ([p, i64, i32p, i32, i32], None),
            "bm_ref_pages": ([p, i32p, i32], None),
            "bm_unref_pages": ([p, i32p, i32], None),
            "bm_refcount": ([p, i32], i32),
        }
        for name, (argtypes, restype) in sigs.items():
            fn = getattr(lib, name)
            fn.argtypes = argtypes
            fn.restype = restype
        _lib = lib
    except Exception:
        _lib = None
    return _lib
