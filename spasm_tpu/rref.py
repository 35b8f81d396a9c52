"""RREF of an echelonized matrix.

!!! Like the reference, this computes the RREF of A*Q (columns permuted so
pivots come first), NOT of A itself (spasm_rref.c:7-21).

Each row of U is re-eliminated against every *other* pivot; rows are
committed in order (deterministic, unlike the reference's first-come
parallel commit, spasm_rref.c:81-118).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from .csr import CSR
from .echelonize import LU
from .triangular import sparse_triangular_solve


def rref(fact: LU) -> Tuple[CSR, np.ndarray]:
    """Returns (R, Rqinv).  R's rows are fully reduced; Rqinv locates the
    pivots of R (column j -> row Rqinv[j], or -1)."""
    U = fact.U
    qinv = fact.qinv
    n, m = U.n, U.m
    rows = []
    x = np.zeros(m, dtype=np.int64)
    qinv_local = np.asarray(qinv, np.int64).copy()
    from . import native
    for i in range(n):
        cols_i, _ = U.row(i)
        pivot = int(cols_i[0])
        assert qinv_local[pivot] == i
        qinv_local[pivot] = -1        # mask own pivot during the solve
        if native.HAVE_NATIVE:
            (cols, vals), = native.solve_batch(U, U, [i], qinv_local,
                                               U.prime)
            keep = (qinv_local[cols] < 0)
            live = cols[keep].astype(np.int64)
            x[live] = vals[keep]
        else:
            pattern, x = sparse_triangular_solve(U, U, i, qinv_local, x)
            live = pattern[(qinv_local[pattern] < 0) & (x[pattern] != 0)]
        # pivot-first property
        live = np.concatenate(([pivot], np.sort(live[live != pivot])))
        rows.append((live.astype(np.int32), x[live].astype(np.int32)))
        qinv_local[pivot] = i
    R = CSR.from_rows(n, m, U.prime, rows)
    Rqinv = np.full(m, -1, dtype=np.int64)
    for i in range(n):
        cols_i, _ = R.row(i)
        Rqinv[cols_i[0]] = i
    return R, Rqinv
