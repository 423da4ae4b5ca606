"""Native (C++) runtime components, loaded via ctypes.

Currently: the sequence-ingest parser (seqio.cpp).  The library is built
on demand with g++ (no network, no pybind11); if the toolchain or zlib
is unavailable the callers fall back to the pure-python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libmctxio.so")
_SRCS = [os.path.join(_DIR, f) for f in ("seqio.cpp", "merge.cpp")]

_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the native library.  Returns True on success."""
    if os.path.exists(_SO) and not force and \
            all(os.path.getmtime(_SO) >= os.path.getmtime(src)
                for src in _SRCS):
        return True
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           *_SRCS, "-o", _SO, "-lz"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=120)
        if r.returncode != 0:
            print(f"[mctx native] build failed:\n{r.stderr}",
                  file=sys.stderr)
            return False
        return True
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"[mctx native] build unavailable: {e}", file=sys.stderr)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        print(f"[mctx native] load failed: {e}", file=sys.stderr)
        return None
    lib.mctx_seq_open.restype = ctypes.c_void_p
    lib.mctx_seq_open.argtypes = [ctypes.c_char_p]
    lib.mctx_seq_close.argtypes = [ctypes.c_void_p]
    lib.mctx_seq_read_batch.restype = ctypes.c_long
    lib.mctx_seq_read_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32)]
    lib.mctx_seq_set_fq_offset.argtypes = [ctypes.c_int]
    lib.mctx_seq_set_fq_offset.restype = None
    lib.mctx_seq_set_chunk_overlap.argtypes = [ctypes.c_long]
    lib.mctx_seq_set_chunk_overlap.restype = None
    _lib = lib
    return _lib
