"""ctypes bindings for the native trajectory I/O library (libtrajio.so).

Build with ``make -C ilqr_tpu/runtime/native`` (auto-attempted on first
import). Every entry point has a pure-Python fallback in
:mod:`ilqr_tpu.utils.io`; this module raises ImportError when the native
library is unavailable so callers can fall back cleanly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtrajio.so")


def _load():
    if not os.path.exists(_SO):
        # Best-effort build; quiet on failure (fallback handles it).
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_DIR, "native")],
                check=True,
                capture_output=True,
                timeout=60,
            )
        except Exception as e:
            raise ImportError(f"libtrajio.so not built: {e}") from e
    lib = ctypes.CDLL(_SO)
    lib.ilqt_write_csv.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.ilqt_write_csv.restype = ctypes.c_int
    lib.ilqt_write_bin.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.ilqt_write_bin.restype = ctypes.c_int
    lib.ilqt_read_bin_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.ilqt_read_bin_header.restype = ctypes.c_int
    lib.ilqt_read_bin.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.ilqt_read_bin.restype = ctypes.c_int
    return lib


_LIB = _load()


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def write_csv(path: str, xs, us) -> None:
    """Reference-format CSV (ref: src/ilqr_core.cpp:414-431)."""
    xs = np.ascontiguousarray(xs, dtype=np.float64)
    us = np.ascontiguousarray(us, dtype=np.float64)
    T, m = us.shape
    n = xs.shape[1]
    rc = _LIB.ilqt_write_csv(path.encode(), _dptr(xs), _dptr(us), T, n, m)
    if rc != 0:
        raise OSError(f"ilqt_write_csv failed with code {rc}")


def write_batch(path: str, xs, us) -> None:
    """Binary batch format: xs (B, T+1, n), us (B, T, m)."""
    xs = np.ascontiguousarray(xs, dtype=np.float64)
    us = np.ascontiguousarray(us, dtype=np.float64)
    if xs.ndim == 2:
        xs, us = xs[None], us[None]
    B, Tp1, n = xs.shape
    _B, T, m = us.shape
    assert B == _B and Tp1 == T + 1
    rc = _LIB.ilqt_write_bin(path.encode(), _dptr(xs), _dptr(us), B, T, n, m)
    if rc != 0:
        raise OSError(f"ilqt_write_bin failed with code {rc}")


def read_batch(path: str):
    """Read a binary batch file → (xs (B, T+1, n), us (B, T, m))."""
    count = ctypes.c_int()
    T = ctypes.c_int()
    n = ctypes.c_int()
    m = ctypes.c_int()
    rc = _LIB.ilqt_read_bin_header(
        path.encode(), ctypes.byref(count), ctypes.byref(T),
        ctypes.byref(n), ctypes.byref(m),
    )
    if rc != 0:
        raise OSError(f"ilqt_read_bin_header failed with code {rc}")
    B, T, n, m = count.value, T.value, n.value, m.value
    xs = np.empty((B, T + 1, n), dtype=np.float64)
    us = np.empty((B, T, m), dtype=np.float64)
    rc = _LIB.ilqt_read_bin(path.encode(), _dptr(xs), _dptr(us))
    if rc != 0:
        raise OSError(f"ilqt_read_bin failed with code {rc}")
    return xs, us
