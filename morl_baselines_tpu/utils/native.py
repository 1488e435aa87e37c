"""ctypes binding to the native host-math library (native/morl_native.cpp).

The TPU compute path is XLA; this library covers the remaining *host-side*
hot math — exact hypervolume of logged fronts (the reference delegates this
to pymoo, common/performance_indicators.py:15) and non-dominated filtering of
large archives (reference common/pareto.py:34-57).

Loading strategy: look for ``native/libmorl_native.so`` next to the repo
root; if absent and a C++ toolchain exists, build it once with ``make``.
Every public function returns ``None`` when the library is unavailable so
callers can fall back to the numpy implementations — the framework never
*requires* the native layer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmorl_native.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_attempted = False


def _build() -> bool:
    """Build the shared library in-tree (idempotent). Returns success."""
    if not (_NATIVE_DIR / "morl_native.cpp").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (OSError, subprocess.SubprocessError):
        return False
    return _LIB_PATH.exists()


def _load() -> ctypes.CDLL | None:
    global _lib, _load_attempted
    with _lock:
        if _load_attempted:
            return _lib
        _load_attempted = True
        if not _LIB_PATH.exists() and os.environ.get("MORL_TPU_NO_NATIVE_BUILD") != "1":
            _build()
        if not _LIB_PATH.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        c_dp = ctypes.POINTER(ctypes.c_double)
        lib.morl_hv_exact.restype = ctypes.c_double
        lib.morl_hv_exact.argtypes = [c_dp, ctypes.c_int64, ctypes.c_int32, c_dp]
        lib.morl_pareto_mask.restype = ctypes.c_int64
        lib.morl_pareto_mask.argtypes = [
            c_dp,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.morl_hv_exact_batch.restype = None
        lib.morl_hv_exact_batch.argtypes = [
            c_dp,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            c_dp,
            c_dp,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_c_doubles(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def hv_exact(points: np.ndarray, ref: np.ndarray) -> float | None:
    """Exact hypervolume (maximization) via the native WFG kernel.

    Returns None when the native library is unavailable or d > 64 — callers
    fall back to the pure-numpy WFG in core/indicators.py.
    """
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    r = np.ascontiguousarray(ref, dtype=np.float64)
    if pts.ndim != 2 or pts.shape[1] != r.shape[0]:
        raise ValueError(f"points {pts.shape} incompatible with ref {r.shape}")
    out = lib.morl_hv_exact(_as_c_doubles(pts), pts.shape[0], pts.shape[1], _as_c_doubles(r))
    return None if out < 0 else float(out)


def hv_exact_batch(fronts: np.ndarray, ref: np.ndarray) -> np.ndarray | None:
    """Exact HV per front for a (B, N, d) stack; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(fronts, dtype=np.float64)
    r = np.ascontiguousarray(ref, dtype=np.float64)
    b, n, d = pts.shape
    out = np.empty((b,), dtype=np.float64)
    lib.morl_hv_exact_batch(_as_c_doubles(pts), b, n, d, _as_c_doubles(r), _as_c_doubles(out))
    if np.any(out < 0):
        return None
    return out


def pareto_mask(points: np.ndarray) -> np.ndarray | None:
    """Non-dominated bool mask (duplicates kept); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n, d = pts.shape
    mask = np.zeros((n,), dtype=np.uint8)
    lib.morl_pareto_mask(
        _as_c_doubles(pts), n, d, mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    return mask.astype(bool)
