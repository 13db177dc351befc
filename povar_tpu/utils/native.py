"""ctypes bridge to the optional C++ fast I/O library (csrc/bal_io.cpp).

The reference's data layer is C++ (fscanf loops over millions of tokens,
bal/bal_problem.cpp:182-471). For multi-GB BAL text files the Python
tokenizer becomes the pipeline bottleneck, so we provide a native
tokenizer built from csrc/ via `make -C csrc` (see csrc/Makefile); when
the shared library is absent everything falls back to numpy parsing.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    return os.path.join(root, "csrc", "libpovar_io.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.povar_count_tokens.restype = ctypes.c_longlong
    lib.povar_count_tokens.argtypes = [ctypes.c_char_p]
    lib.povar_parse_tokens.restype = ctypes.c_longlong
    lib.povar_parse_tokens.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_longlong,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def parse_tokens(path: str) -> np.ndarray:
    """Parse all whitespace-separated numeric tokens of a file natively."""
    lib = _load()
    assert lib is not None
    n = lib.povar_count_tokens(path.encode())
    if n < 0:
        raise IOError(f"native tokenizer failed to open {path}")
    out = np.empty(n, dtype=np.float64)
    got = lib.povar_parse_tokens(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
    )
    if got != n:
        raise IOError(f"native tokenizer parsed {got} of {n} tokens in {path}")
    return out
