"""Native (C++) host runtime pieces, built on demand with g++.

Holds the sequential hot loops of the tape compiler (tape_compile.cpp) —
compile them once per machine into ``build/libgsvnative.so`` and bind via
ctypes.  Falls back silently to the pure-Python implementations when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "build")
_SO = os.path.join(_BUILD, "libgsvnative.so")
_SRC = os.path.join(_DIR, "tape_compile.cpp")

_lib = None


def _build() -> str | None:
    try:
        os.makedirs(_BUILD, exist_ok=True)
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO + ".tmp"],
                check=True,
                capture_output=True,
            )
            os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception:
        return None


def lib():
    global _lib
    if _lib is None:
        path = _build()
        if path is None:
            _lib = False
        else:
            try:
                _lib = ctypes.CDLL(path)
                _lib.compute_levels.restype = None
                _lib.alloc_slots.restype = ctypes.c_int64
            except Exception:
                _lib = False
    return _lib or None


def _ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def compute_levels(a: np.ndarray, b: np.ndarray, c: np.ndarray, n_wires: int) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    n = len(a)
    out = np.empty(n, dtype=np.int64)
    L.compute_levels(
        ctypes.c_int64(n), _ptr(np.ascontiguousarray(a)), _ptr(np.ascontiguousarray(b)),
        _ptr(np.ascontiguousarray(c)), ctypes.c_int64(n_wires), _ptr(out),
    )
    return out


def alloc_slots(
    order: np.ndarray,
    gate_level: np.ndarray,
    c: np.ndarray,
    last_read: np.ndarray,
    n_wires: int,
    pin_sentinel: int,
):
    L = lib()
    if L is None:
        return None
    slot_of = np.empty(n_wires, dtype=np.int64)
    fs = L.alloc_slots(
        ctypes.c_int64(len(order)), _ptr(np.ascontiguousarray(order)),
        _ptr(np.ascontiguousarray(gate_level)), _ptr(np.ascontiguousarray(c)),
        _ptr(np.ascontiguousarray(last_read)), ctypes.c_int64(n_wires),
        ctypes.c_int64(pin_sentinel), _ptr(slot_of),
    )
    return slot_of, int(fs)
