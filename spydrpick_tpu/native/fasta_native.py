"""ctypes loader for the native FASTA parser (fasta.cpp)."""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "fasta.cpp"
_LIB = _DIR / "libfasta.so"
_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fopenmp", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(str(_LIB))
    lib.spydrpick_fasta_index.restype = ctypes.c_int
    lib.spydrpick_fasta_index.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.spydrpick_fasta_parse.restype = ctypes.c_int
    lib.spydrpick_fasta_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def parse(path: str) -> tuple[np.ndarray, list[str]]:
    """(codes (S, L) uint8, sample names). Raises on malformed input."""
    lib = _load()
    n = ctypes.c_int64()
    w = ctypes.c_int64()
    rc = lib.spydrpick_fasta_index(str(path).encode(), ctypes.byref(n), ctypes.byref(w))
    if rc == -1:
        # the native open_map rejects missing AND zero-length files with
        # the same code; report the empty case like the numpy parser does
        import os

        if os.path.exists(path) and os.path.getsize(path) == 0:
            raise ValueError(f"{path}: empty FASTA file")
        raise FileNotFoundError(path)
    if rc == -2:
        raise ValueError(f"{path}: malformed FASTA")
    if rc == -3:
        raise ValueError(f"{path}: unaligned sequences (differing widths)")
    S, L = n.value, w.value
    codes = np.empty((S, L), dtype=np.uint8)
    namebuf_cap = 1 << 22
    namebuf = ctypes.create_string_buffer(namebuf_cap)
    rc = lib.spydrpick_fasta_parse(
        str(path).encode(),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(S), ctypes.c_int64(L), namebuf, ctypes.c_int64(namebuf_cap),
    )
    if rc != 0:
        raise ValueError(f"{path}: FASTA parse failed (code {rc})")
    names = namebuf.raw.split(b"\0")[:S]
    return codes, [x.decode("utf-8", errors="replace") for x in names]
