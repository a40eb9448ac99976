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
    lib.lcx_csv_open.argtypes = [ctypes.c_char_p, ctypes.c_char, i64]
    lib.lcx_csv_open.restype = ctypes.c_void_p
    lib.lcx_csv_cols.argtypes = [ctypes.c_void_p]
    lib.lcx_csv_cols.restype = i64
    lib.lcx_csv_read_block.argtypes = [ctypes.c_void_p, i64, dp]
    lib.lcx_csv_read_block.restype = i64
    lib.lcx_csv_close.argtypes = [ctypes.c_void_p]
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


class CsvReader:
    """Streaming block reader over a delimited numeric text file
    (native/loader.cpp): single buffered pass, std::from_chars parsing,
    blocks land in preallocated float64 NumPy buffers. Iterate to get
    (block_rows, cols) arrays; the last block may be shorter. Measured
    up to ~300 MB/s vs numpy.loadtxt's ~60 (CPU-contention dependent),
    with O(block) memory instead of the whole file.

    Raises RuntimeError when the native library is unavailable — callers
    that need a fallback use `iter_text_blocks` (utils/streaming.py),
    which dispatches here when possible.
    """

    def __init__(self, path: str, block_rows: int = 8192,
                 delimiter: str = ",", skip_header: int = 0):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        if block_rows < 1:
            raise ValueError(f"block_rows must be >= 1, got {block_rows}")
        self._lib = lib
        self._h = lib.lcx_csv_open(os.fsencode(path),
                                   delimiter.encode()[:1], skip_header)
        if not self._h:
            raise FileNotFoundError(path)
        self.cols = int(lib.lcx_csv_cols(self._h))
        if self.cols <= 0:
            self.close()
            raise ValueError(f"{path}: no parsable numeric rows")
        self.block_rows = block_rows

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._h is None:
            raise StopIteration
        out = np.empty((self.block_rows, self.cols), np.float64)
        got = self._lib.lcx_csv_read_block(self._h, self.block_rows,
                                           _as_c(out))
        if got < 0:
            self.close()
            raise ValueError("unparsable numeric row in input")
        if got == 0:
            self.close()
            raise StopIteration
        return out[:got]

    def close(self):
        if self._h is not None:
            self._lib.lcx_csv_close(self._h)
            self._h = None

    def __del__(self):
        # abandoned iteration (break / consumer exception) must not leak
        # the native FILE* and 1 MB reader for the process lifetime
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
