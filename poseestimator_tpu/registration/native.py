"""ctypes binding to the native (C++) exact max-clique solver.

Builds ``native/libpe_native.so`` on first use if g++ is available (no
pybind11 dependency — plain C ABI). ``available()`` gates callers;
the TPU greedy kernel is the product path, this is the certified-exact
verifier/fallback (see registration/maxclique.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpe_native.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.pe_max_clique.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib.pe_max_clique.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def max_clique_exact(adj: np.ndarray, valid: Optional[np.ndarray] = None):
    """Certified maximum clique of a boolean adjacency matrix.

    Returns ``(mask (n,) bool, size int)``. Raises RuntimeError if the native
    library cannot be built/loaded.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native max-clique library unavailable (g++/make missing?)")
    adj = np.asarray(adj, bool)
    n = adj.shape[0]
    if valid is not None:
        v = np.asarray(valid, bool)
        adj = adj & v[:, None] & v[None, :]
    buf = np.ascontiguousarray(adj.astype(np.uint8))
    out = np.zeros(n, np.int32)
    size = lib.pe_max_clique(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if size < 0:
        raise RuntimeError(f"pe_max_clique failed (n={n})")
    mask = np.zeros(n, bool)
    mask[out[:size]] = True
    return mask, int(size)
