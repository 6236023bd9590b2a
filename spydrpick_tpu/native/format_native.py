"""ctypes loader/builder for the native couplings-row formatter.

Compiles format.cpp with g++ on first use (cached next to the source;
rebuilt when the source is newer).  Callers catch exceptions and fall
back to the Python formatter.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "format.cpp"
_LIB = _DIR / "libformat.so"
_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-std=c++17", "-fopenmp", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    lib.spydrpick_format_couplings.restype = ctypes.c_int64
    lib.spydrpick_format_couplings.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def format_couplings(p1, p2, dist, flags, mi, chunk: int = 1 << 20) -> bytes:
    """Formatted couplings rows as bytes (chunked: bounded scratch)."""
    lib = _load()
    n = len(mi)
    if n == 0:
        return b""
    p1 = np.ascontiguousarray(p1, dtype=np.int64)
    p2 = np.ascontiguousarray(p2, dtype=np.int64)
    dist = np.ascontiguousarray(dist, dtype=np.int64)
    flags = np.ascontiguousarray(flags, dtype=np.uint8)
    mi = np.ascontiguousarray(mi, dtype=np.float64)
    pieces = []
    ptr = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    for c0 in range(0, n, chunk):
        m = min(chunk, n - c0)
        cap = 96 * m
        buf = ctypes.create_string_buffer(cap)
        rc = lib.spydrpick_format_couplings(
            ptr(p1[c0:], ctypes.c_int64), ptr(p2[c0:], ctypes.c_int64),
            ptr(dist[c0:], ctypes.c_int64), ptr(flags[c0:], ctypes.c_uint8),
            ptr(mi[c0:], ctypes.c_double), ctypes.c_int64(m),
            buf, ctypes.c_int64(cap),
        )
        if rc < 0:
            raise RuntimeError("format buffer overflow")
        pieces.append(buf.raw[:rc])
    return b"".join(pieces)
