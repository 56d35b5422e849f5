"""Native (C++) runtime components, loaded through ctypes.

``fastio`` replaces the NumPy text-matrix IO on the framework's host-side hot
path: the reference's dataset triplets and posterior-path exports are
whitespace-separated float matrices (``np.loadtxt``/``np.savetxt``,
reference ``AR.py:366-374,323-362``), and at FHN long-series scale
(`fitz_nag_NVP.py:456-457`: 50 particles x 2 species x 1e6 steps ≈ 2.5 GB)
NumPy's Python-level row formatting/tokenizing takes minutes. The C++
implementation (fastio.cpp) streams through an 8 MB buffer at
fwrite/strtod speed.

The shared library is compiled on first use with the image's ``g++`` and
cached next to the source; every entry point falls back to NumPy when no
compiler/library is available, so nothing here is load-bearing for
correctness. Format compatibility: identical to ``np.savetxt`` defaults
('%.18e', space-separated, newline rows), so files interchange with the
reference scripts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastio.cpp")
_LIB_PATH = os.path.join(_HERE, "libfastio.so")
_lock = threading.Lock()
_lib = None
_lib_tried = False


def _load():
    """Compile (once) and dlopen the native library; None if unavailable."""
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        try:
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                     "-o", _LIB_PATH + ".tmp", _SRC],
                    check=True, capture_output=True,
                )
                os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.fastio_write_matrix.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
                ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ]
            lib.fastio_write_matrix.restype = ctypes.c_int
            lib.fastio_count_tokens.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ]
            lib.fastio_count_tokens.restype = None
            lib.fastio_parse_doubles.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ]
            lib.fastio_parse_doubles.restype = ctypes.c_long
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def savetxt(path, arr, precision: int = 18):
    """np.savetxt-compatible ('%.<precision>e', space-separated) matrix write."""
    a = np.ascontiguousarray(np.atleast_2d(np.asarray(arr, dtype=np.float64)))
    if a.ndim != 2:
        raise ValueError(f"savetxt expects a 1-D or 2-D array, got shape {a.shape}")
    lib = _load()
    if lib is None:
        np.savetxt(path, a, fmt=f"%.{precision}e")
        return
    rc = lib.fastio_write_matrix(
        os.fspath(path).encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        a.shape[0], a.shape[1], precision,
    )
    if rc != 0:
        raise OSError(f"fastio_write_matrix failed with code {rc} for {path}")


def loadtxt(path) -> np.ndarray:
    """np.loadtxt-compatible read of a regular whitespace-separated matrix.

    Returns a 1-D array for single-row/column files (np.loadtxt squeeze
    semantics) and a (rows, cols) array otherwise.
    """
    lib = _load()
    if lib is None:
        return np.loadtxt(path)
    with open(path, "rb") as f:
        buf = f.read() + b"\0"  # strtod guard; see fastio_parse_doubles
    n_tok = ctypes.c_long()
    n_rows = ctypes.c_long()
    lib.fastio_count_tokens(buf, len(buf) - 1, ctypes.byref(n_tok), ctypes.byref(n_rows))
    if n_tok.value == 0:
        return np.empty((0,), dtype=np.float64)
    out = np.empty((n_tok.value,), dtype=np.float64)
    got = lib.fastio_parse_doubles(
        buf, len(buf) - 1, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_tok.value,
    )
    if got != n_tok.value:
        # malformed token (e.g. text header) — defer to NumPy's richer parser
        return np.loadtxt(path)
    rows = max(n_rows.value, 1)
    if got % rows != 0:  # ragged file — NumPy semantics differ; defer
        return np.loadtxt(path)
    cols = got // rows
    if rows == 1 or cols == 1:
        return out  # np.loadtxt squeezes single-row/column files to 1-D
    return out.reshape(rows, cols)
