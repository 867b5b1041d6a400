"""Native (C++) data-plane helpers, loaded via ctypes.

The shared library builds on first import (g++, ~1s) and is cached next
to the source; failures fall back silently to the numpy paths (callers
in lr2ppo_tpu.data.letor already guard with try/except).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "parser.cpp")
_LIB = os.path.join(_DIR, "_parser.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    # compile to a per-pid temp and os.replace: an interrupted or
    # concurrent build (multi-process launch, parallel pytest) must
    # never leave a truncated _parser.so with a fresh mtime that the
    # staleness check would then trust forever
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.parse_svmlight.restype = ctypes.POINTER(ctypes.c_float)
        lib.parse_svmlight.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_long)]
        lib.parse_tsv.restype = ctypes.POINTER(ctypes.c_float)
        lib.parse_tsv.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_long),
                                  ctypes.POINTER(ctypes.c_long)]
        lib.free_buffer.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return lib


def parse_svmlight(path: str, num_features: int) -> Optional[np.ndarray]:
    """svmlight -> (rows, 2+F) float32 [label, qid, feats...], qid-sorted
    (stable), matching the numpy fallback in data/letor.py."""
    lib = _load()
    n = ctypes.c_long(0)
    ptr = lib.parse_svmlight(path.encode(), num_features, ctypes.byref(n))
    if not ptr:
        return None
    if n.value == 0:                 # malloc(0) still needs its free
        lib.free_buffer(ptr)
        return None
    try:
        stride = 2 + num_features
        arr = np.ctypeslib.as_array(ptr, shape=(n.value, stride)).copy()
    finally:
        lib.free_buffer(ptr)
    return arr[np.argsort(arr[:, 1], kind="stable")]


def parse_tsv(path: str) -> Optional[np.ndarray]:
    lib = _load()
    rows, cols = ctypes.c_long(0), ctypes.c_long(0)
    ptr = lib.parse_tsv(path.encode(), ctypes.byref(rows),
                        ctypes.byref(cols))
    if not ptr:
        return None
    if rows.value == 0:
        lib.free_buffer(ptr)
        return None
    try:
        arr = np.ctypeslib.as_array(
            ptr, shape=(rows.value, cols.value)).copy()
    finally:
        lib.free_buffer(ptr)
    return arr
