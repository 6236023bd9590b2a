"""ctypes loader/builder for the native ARACNE kernel.

Compiles aracne.cpp with g++ on first use (cached next to the source;
rebuilt when the source is newer than the library).  Falls back cleanly
— callers catch exceptions and use the NumPy implementation.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "aracne.cpp"
_LIB = _DIR / "libaracne.so"
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
    lib.spydrpick_aracne_mark.restype = ctypes.c_int
    lib.spydrpick_aracne_mark.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def mark_indirect(
    ipos: np.ndarray, jpos: np.ndarray, mi: np.ndarray, threshold: float
) -> np.ndarray:
    """(E,) bool indirect flags via the C++ kernel."""
    lib = _load()
    E = len(mi)
    if E == 0:
        return np.zeros(0, dtype=bool)
    # no dense renumbering: position ids are already bounded by the
    # alignment width, and absent ids are just degree-0 CSR rows the
    # kernel skips — the previous sort-based np.unique(return_inverse)
    # cost more than the kernel itself at bench scale (1.8 s vs 1.1 s
    # at 3.2M edges)
    a = np.ascontiguousarray(ipos, dtype=np.int64)
    b = np.ascontiguousarray(jpos, dtype=np.int64)
    n_nodes = int(max(a.max(), b.max())) + 1
    w = np.ascontiguousarray(mi, dtype=np.float64)
    out = np.zeros(E, dtype=np.uint8)
    rc = lib.spydrpick_aracne_mark(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(E),
        ctypes.c_int64(n_nodes),
        ctypes.c_double(threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f"aracne native kernel failed with rc={rc}")
    return out.astype(bool)
