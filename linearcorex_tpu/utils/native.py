"""ctypes bindings for the native host-side preprocessing library.

`native/gaussianize.cpp` implements the two host-side kernels of the
preprocessing layer (empirical gaussianization with average-tie ranks +
AS241 inverse-normal; sentinel mean-imputation) with a plain C ABI. This
module loads it if built (`make -C native`), builds it on demand when a
compiler is present, and otherwise reports unavailability so callers fall
back to the scipy/JAX paths — behavior is identical either way (tested to
double precision in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "liblcx_native.so")

_lib = None
_load_failed = False


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library, or None."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not os.path.exists(_SO_PATH) and not _try_build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _load_failed = True
        return None
    i64, dp = ctypes.c_int64, ctypes.POINTER(ctypes.c_double)
    lib.lcx_empirical_gaussianize.argtypes = [dp, dp, i64, i64]
    lib.lcx_mean_impute.argtypes = [dp, i64, i64, ctypes.c_double]
    lib.lcx_mean_impute_nan.argtypes = [dp, i64, i64]
    lib.lcx_ndtri.argtypes = [dp, dp, i64]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def empirical_gaussianize(x: np.ndarray) -> np.ndarray:
    """Column-wise rank-gaussianize (native): norm.ppf((rank-0.5)/n)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(x)
    n, p = x.shape
    lib.lcx_empirical_gaussianize(_as_c(x), _as_c(out), n, p)
    return out


def mean_impute(x: np.ndarray, sentinel: float) -> np.ndarray:
    """Replace sentinel entries by per-column observed means (native).
    A NaN sentinel dispatches to the isnan variant."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.ascontiguousarray(x, dtype=np.float64).copy()
    n, p = out.shape
    if isinstance(sentinel, float) and np.isnan(sentinel):
        lib.lcx_mean_impute_nan(_as_c(out), n, p)
    else:
        lib.lcx_mean_impute(_as_c(out), n, p, sentinel)
    return out


def ndtri(p: np.ndarray) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    p = np.ascontiguousarray(p, dtype=np.float64)
    out = np.empty_like(p)
    lib.lcx_ndtri(_as_c(p), _as_c(out), p.size)
    return out
