"""Native (C++) host kernels, loaded via ctypes.

The shared library is compiled on first import (g++ -O3 -fopenmp); when no
toolchain is available every entry point falls back to the pure-Python
implementation at the call sites (spasm_tpu degrades gracefully).

Surface:
  solve_batch        — parallel batched sparse triangular solves
  cycle_free_pivots  — greedy alternating-cycle-free pivot search
  gplu               — sequential Gilbert-Peierls LU finisher
  matching           — bipartite maximum matching
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import sys
import tempfile
from typing import List, Optional, Tuple

import numpy as np

_HERE = pathlib.Path(__file__).parent
_SRC = _HERE / "spasm_kernels.cpp"
_LIB_DIR = pathlib.Path(os.environ.get(
    "SPASM_TPU_NATIVE_DIR",
    os.path.expanduser("~/.cache/spasm_tpu_native")))

_lib = None
HAVE_NATIVE = False


def _build() -> Optional[pathlib.Path]:
    _LIB_DIR.mkdir(parents=True, exist_ok=True)
    so = _LIB_DIR / "libspasm_kernels.so"
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", str(_SRC), "-o", str(so) + ".tmp"]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=240)
        if r.returncode != 0:
            sys.stderr.write("[spasm_tpu.native] build failed:\n"
                             + r.stderr.decode()[:2000] + "\n")
            return None
        os.replace(str(so) + ".tmp", so)
        return so
    except (OSError, subprocess.TimeoutExpired) as e:
        sys.stderr.write(f"[spasm_tpu.native] build error: {e}\n")
        return None


def _load():
    global _lib, HAVE_NATIVE
    if _lib is not None or os.environ.get("SPASM_TPU_NO_NATIVE"):
        return
    so = _build()
    if so is None:
        return
    try:
        lib = ctypes.CDLL(str(so))
    except OSError as e:                              # pragma: no cover
        sys.stderr.write(f"[spasm_tpu.native] load error: {e}\n")
        return
    I64 = ctypes.POINTER(ctypes.c_int64)
    I32 = ctypes.POINTER(ctypes.c_int32)
    lib.spasm_solve_batch.restype = ctypes.c_int64
    lib.spasm_solve_batch.argtypes = [
        I64, I32, I32, ctypes.c_int32, ctypes.c_int32,
        I64, I32, I32, ctypes.c_int32,
        I64, ctypes.c_int64, I64, ctypes.c_int64, ctypes.c_int32, I64]
    lib.spasm_solve_fetch.argtypes = [I64, I32, I32]
    lib.spasm_cycle_free_pivots.restype = ctypes.c_int64
    lib.spasm_cycle_free_pivots.argtypes = [
        I64, I32, ctypes.c_int32, ctypes.c_int32, I64, I64,
        ctypes.c_int64]
    lib.spasm_gplu.restype = ctypes.c_int64
    lib.spasm_gplu.argtypes = [
        I64, I32, I32, ctypes.c_int32, ctypes.c_int32,
        I64, ctypes.c_int64, I64,
        I64, I32, I32, ctypes.c_int32,
        I64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64]
    lib.spasm_gplu_sizes.argtypes = [I64]
    lib.spasm_gplu_fetch.argtypes = [I64, I32, I32, I64, I64, I32, I64]
    lib.spasm_matching.restype = ctypes.c_int64
    lib.spasm_matching.argtypes = [I64, I32, ctypes.c_int32,
                                   ctypes.c_int32, I64, I64]
    lib.spasm_fl_column_pivots.restype = ctypes.c_int64
    lib.spasm_fl_column_pivots.argtypes = [
        I64, I32, ctypes.c_int32, ctypes.c_int32, I64, I64]
    lib.spasm_topo_order.restype = ctypes.c_int64
    lib.spasm_topo_order.argtypes = [
        I64, I32, ctypes.c_int32, ctypes.c_int32, I64, I64, I64]
    lib.spasm_row_levels.argtypes = [
        I64, I32, ctypes.c_int32, ctypes.c_int32, I64, ctypes.c_int64,
        I64, I64]
    _lib = lib
    HAVE_NATIVE = True


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _p32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


_EMPTY64 = np.zeros(1, np.int64)
_EMPTY32 = np.zeros(1, np.int32)


def _arr64(a) -> np.ndarray:
    a = np.ascontiguousarray(a, np.int64)
    return a if a.size else _EMPTY64


def _arr32(a) -> np.ndarray:
    a = np.ascontiguousarray(a, np.int32)
    return a if a.size else _EMPTY32


def solve_batch(U, B, rows, qinv, prime: int, nthreads: int = 0,
                mask_cols=None) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Batched x*U = B[row] solves.  Returns [(cols, vals)] per row with
    coefficients on pivotal columns and the Schur residue elsewhere,
    column-sorted.  mask_cols (optional, per row): one column treated as
    non-pivotal during that row's solve (-1 = none) — lets RREF mask each
    row's own pivot while solving all rows in ONE parallel batch."""
    rows = _arr64(rows)
    mc = _arr64(mask_cols) if mask_cols is not None else None
    total = _lib.spasm_solve_batch(
        _p64(_arr64(U.indptr)), _p32(_arr32(U.indices)),
        _p32(_arr32(U.data)), U.n, U.m,
        _p64(_arr64(B.indptr)), _p32(_arr32(B.indices)),
        _p32(_arr32(B.data)), B.n,
        _p64(rows), len(rows), _p64(_arr64(qinv)), prime, nthreads,
        _p64(mc) if mc is not None else None)
    lens = np.empty(max(len(rows), 1), np.int64)
    cols = np.empty(max(total, 1), np.int32)
    vals = np.empty(max(total, 1), np.int32)
    _lib.spasm_solve_fetch(_p64(lens), _p32(cols), _p32(vals))
    out = []
    off = 0
    for k in range(len(rows)):
        ln = int(lens[k])
        out.append((cols[off:off + ln].copy(), vals[off:off + ln].copy()))
        off += ln
    return out


def cycle_free_pivots(A, pinv: np.ndarray, qinv: np.ndarray,
                      work_budget: int = 0) -> int:
    return int(_lib.spasm_cycle_free_pivots(
        _p64(_arr64(A.indptr)), _p32(_arr32(A.indices)), A.n, A.m,
        _p64(pinv), _p64(qinv), work_budget))


def gplu(S, rows, row_origin, U0, qinv: np.ndarray, prime: int,
         want_L: bool, max_pivots: int):
    """Sequential GPLU of S rows against existing basis U0.

    qinv updated in place.  Returns (npiv, u_rows [(cols, vals)...],
    l_triplets (i, j, x), piv_origin)."""
    rows = _arr64(rows)
    ro = _arr64(row_origin) if row_origin is not None else None
    npiv = _lib.spasm_gplu(
        _p64(_arr64(S.indptr)), _p32(_arr32(S.indices)),
        _p32(_arr32(S.data)), S.n, S.m,
        _p64(rows), len(rows),
        _p64(ro) if ro is not None else None,
        _p64(_arr64(U0.indptr)), _p32(_arr32(U0.indices)),
        _p32(_arr32(U0.data)), U0.n,
        _p64(qinv), prime, 1 if want_L else 0, max_pivots)
    sizes = np.empty(3, np.int64)
    _lib.spasm_gplu_sizes(_p64(sizes))
    nu, unnz, lnnz = (int(s) for s in sizes)
    u_lens = np.empty(max(nu, 1), np.int64)
    u_cols = np.empty(max(unnz, 1), np.int32)
    u_vals = np.empty(max(unnz, 1), np.int32)
    l_i = np.empty(max(lnnz, 1), np.int64)
    l_j = np.empty(max(lnnz, 1), np.int64)
    l_x = np.empty(max(lnnz, 1), np.int32)
    piv_origin = np.empty(max(nu, 1), np.int64)
    _lib.spasm_gplu_fetch(_p64(u_lens), _p32(u_cols), _p32(u_vals),
                          _p64(l_i), _p64(l_j), _p32(l_x),
                          _p64(piv_origin))
    urows = []
    off = 0
    for k in range(nu):
        ln = int(u_lens[k])
        urows.append((u_cols[off:off + ln].copy(),
                      u_vals[off:off + ln].copy()))
        off += ln
    return (npiv, urows, (l_i[:lnnz], l_j[:lnnz], l_x[:lnnz]),
            piv_origin[:nu])


def fl_column_pivots(A, pinv: np.ndarray, qinv: np.ndarray) -> int:
    return int(_lib.spasm_fl_column_pivots(
        _p64(_arr64(A.indptr)), _p32(_arr32(A.indices)), A.n, A.m,
        _p64(pinv), _p64(qinv)))


def topo_order(A, pinv: np.ndarray, qinv: np.ndarray) -> np.ndarray:
    p = np.empty(A.n, np.int64)
    _lib.spasm_topo_order(
        _p64(_arr64(A.indptr)), _p32(_arr32(A.indices)), A.n, A.m,
        _p64(_arr64(pinv)), _p64(_arr64(qinv)),
        _p64(p if A.n else _EMPTY64))
    return p


def row_levels(A, rows: np.ndarray, pinv: np.ndarray) -> np.ndarray:
    npiv = int(np.asarray(rows).size)
    rows = _arr64(rows)
    out = np.zeros(max(npiv, 1), np.int64)
    _lib.spasm_row_levels(
        _p64(_arr64(A.indptr)), _p32(_arr32(A.indices)), A.n, A.m,
        _p64(rows), npiv, _p64(_arr64(pinv)), _p64(out))
    return out[:npiv]


def matching(A) -> Tuple[int, np.ndarray, np.ndarray]:
    jmatch = np.empty(A.n, np.int64)
    imatch = np.empty(A.m, np.int64)
    size = _lib.spasm_matching(
        _p64(_arr64(A.indptr)), _p32(_arr32(A.indices)), A.n, A.m,
        _p64(jmatch if A.n else _EMPTY64),
        _p64(imatch if A.m else _EMPTY64))
    return int(size), jmatch, imatch


_load()
