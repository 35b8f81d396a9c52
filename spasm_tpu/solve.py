"""Linear-system solving through a complete PLUQ factorization.

Port of /root/reference/src/spasm_solve.c: x.A = b is solved as a forward
solve z.U = b (consistency check) followed by a back solve x.L = z.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .csr import CSR
from .echelonize import LU
from .spmv import scatter
from .triangular import dense_back_solve, dense_forward_solve


def solve(fact: LU, b: np.ndarray) -> Tuple[bool, np.ndarray]:
    """Solve x.A = b (b of size m).  Returns (ok, x of size n).
    (spasm_solve.c:13-47)"""
    L, U = fact.L, fact.U
    assert L is not None, "solve requires a factorization with L (opts.L)"
    m = U.m
    r = U.n
    qinv = fact.qinv
    # Uq[i] = pivot column of row i
    Uq = np.empty(r, dtype=np.int64)
    cols = np.nonzero(np.asarray(qinv) >= 0)[0]
    Uq[np.asarray(qinv)[cols]] = cols
    y = b.astype(np.int64).copy()
    ok, z = dense_forward_solve(U, y, Uq)
    x = dense_back_solve(L, z.astype(np.int64), fact.p)
    return ok, x


def gesv(fact: LU, B: CSR, want_ok: bool = True):
    """Solve X.A == B for every row of B (spasm_solve.c:52-93).

    Returns (X: CSR, ok: bool array or None); row i of X is garbage when
    ok[i] is False.
    """
    n, m = B.n, B.m
    Xm = fact.L.n
    ok = np.zeros(n, dtype=bool) if want_ok else None
    rows = []
    for i in range(n):
        b = np.zeros(m, dtype=np.int64)
        scatter(B, i, 1, b)
        res, x = solve(fact, b)
        if ok is not None:
            ok[i] = res
        nz = np.nonzero(x)[0]
        rows.append((nz.astype(np.int32), x[nz].astype(np.int32)))
    X = CSR.from_rows(n, Xm, B.prime, rows)
    return X, ok
