"""Native host runtime — ctypes bindings over tagrec_tpu/runtime/native.cpp.

Provides C++ implementations of the host-side hot paths (interaction/triple
file parsing, ELL packing, TGCN neighbor-table sampling, exact rejection
negative sampling) with transparent numpy fallbacks when the shared library
is unavailable.  The library is compiled on demand with g++ and cached next
to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.cpp")
_LIB_PATH = os.path.join(_DIR, "libtagrec_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.parse_interactions.restype = ctypes.c_int64
        lib.parse_interactions.argtypes = [ctypes.c_char_p, i64p, i64p,
                                           ctypes.c_int64]
        lib.parse_triples.restype = ctypes.c_int64
        lib.parse_triples.argtypes = [ctypes.c_char_p, i64p, ctypes.c_int64]
        lib.ell_pack.restype = None
        lib.ell_pack.argtypes = [i64p, i64p, f32p, ctypes.c_int64,
                                 ctypes.c_int64, i32p, f32p, i32p]
        lib.neighbor_sample.restype = None
        lib.neighbor_sample.argtypes = [i64p, i64p, f32p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_uint64,
                                        i32p, i32p]
        lib.sample_negatives.restype = None
        lib.sample_negatives.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                         ctypes.c_int64, ctypes.c_uint64, i64p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------------------
# public API (native with numpy fallback)
# ---------------------------------------------------------------------------

def parse_interaction_pairs(path: str) -> np.ndarray:
    """[E, 2] (user, item) pairs from a ``u i1 i2 ...`` file (duplicates kept;
    callers dedup).  Native fast path; falls back to the pure-Python reader."""
    lib = get_lib()
    if lib is None:
        from tagrec_tpu.data import io as data_io
        d = data_io.read_interaction_file(path)
        return data_io.interactions_to_edges(d)
    import os
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    n = lib.parse_interactions(path.encode(), None, None, 0)
    if n < 0:
        raise IOError(f"cannot parse {path}")
    u = np.empty(n, dtype=np.int64)
    i = np.empty(n, dtype=np.int64)
    got = lib.parse_interactions(path.encode(), _ptr(u, ctypes.c_int64),
                                 _ptr(i, ctypes.c_int64), n)
    assert got == n
    return np.stack([u, i], axis=1)


def parse_triples(path: str) -> np.ndarray:
    """[T, 3] integer triples (not deduped)."""
    lib = get_lib()
    if lib is None:
        data = np.loadtxt(path, dtype=np.int64)
        return data[None, :] if data.ndim == 1 else data
    import os
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    n = lib.parse_triples(path.encode(), None, 0)
    if n < 0:
        raise IOError(f"cannot parse {path}")
    out = np.empty((n, 3), dtype=np.int64)
    got = lib.parse_triples(path.encode(), _ptr(out, ctypes.c_int64), n)
    assert got == n
    return out


def ell_pack(row: np.ndarray, col: np.ndarray, val: np.ndarray,
             n_rows: int, width: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Row-sorted COO -> (idx[n,w] i32, val[n,w] f32, deg[n] i32)."""
    idx = np.zeros((n_rows, width), dtype=np.int32)
    v = np.zeros((n_rows, width), dtype=np.float32)
    deg = np.zeros(n_rows, dtype=np.int32)
    lib = get_lib()
    row = np.ascontiguousarray(row, dtype=np.int64)
    col = np.ascontiguousarray(col, dtype=np.int64)
    val = np.ascontiguousarray(val, dtype=np.float32)
    if lib is None:
        starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(np.bincount(row, minlength=n_rows), out=starts[1:])
        slot = np.arange(len(row)) - starts[row]
        keep = slot < width
        idx[row[keep], slot[keep]] = col[keep].astype(np.int32)
        v[row[keep], slot[keep]] = val[keep]
        deg[:] = np.minimum(np.bincount(row, minlength=n_rows), width)
        return idx, v, deg
    lib.ell_pack(_ptr(row, ctypes.c_int64), _ptr(col, ctypes.c_int64),
                 _ptr(val, ctypes.c_float), len(row), width,
                 _ptr(idx, ctypes.c_int32), _ptr(v, ctypes.c_float),
                 _ptr(deg, ctypes.c_int32))
    return idx, v, deg


def neighbor_sample_csr(indptr: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                        k: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """TGCN fixed-width neighbor sampling (ids +1; 0 pad), native path."""
    n_rows = len(indptr) - 1
    idx = np.zeros((n_rows, k), dtype=np.int32)
    w = np.zeros((n_rows, k), dtype=np.int32)
    lib = get_lib()
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    if lib is None:
        rng = np.random.default_rng(seed)
        for r in range(n_rows):
            lo, hi = indptr[r], indptr[r + 1]
            if hi == lo:
                continue
            sel = rng.integers(lo, hi, size=k)
            idx[r] = cols[sel] + 1
            w[r] = vals[sel].astype(np.int32)
        return idx, w
    lib.neighbor_sample(_ptr(indptr, ctypes.c_int64), _ptr(cols, ctypes.c_int64),
                        _ptr(vals, ctypes.c_float), n_rows, k, seed,
                        _ptr(idx, ctypes.c_int32), _ptr(w, ctypes.c_int32))
    return idx, w


def sample_negatives_exact(indptr: np.ndarray, sorted_cols: np.ndarray,
                           heads: np.ndarray, n_ids: int,
                           seed: int) -> np.ndarray:
    """Exact rejection sampling (reference parity mode) over a CSR positive set."""
    out = np.empty(len(heads), dtype=np.int64)
    lib = get_lib()
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    sorted_cols = np.ascontiguousarray(sorted_cols, dtype=np.int64)
    heads = np.ascontiguousarray(heads, dtype=np.int64)
    if lib is None:
        rng = np.random.default_rng(seed)
        for b, h in enumerate(heads):
            pos = set(sorted_cols[indptr[h]:indptr[h + 1]].tolist())
            while True:
                c = int(rng.integers(0, n_ids))
                if c not in pos:
                    out[b] = c
                    break
        return out
    lib.sample_negatives(_ptr(indptr, ctypes.c_int64),
                         _ptr(sorted_cols, ctypes.c_int64),
                         _ptr(heads, ctypes.c_int64), len(heads), n_ids, seed,
                         _ptr(out, ctypes.c_int64))
    return out
