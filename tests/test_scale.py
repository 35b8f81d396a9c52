"""Large-instance end-to-end test (slow): a >= 1e5-row matrix through
the full engine with mid-run checkpointing enabled.

Construction with provable rank: A = [[T, 0], [R, D]] where T is a
100000-row unit-upper-triangular sparse block (full rank, found by the
structural pivot passes), D a 400 x 600 block of known rank on fresh
columns, and R an arbitrary coupling into T's columns.  T's rows have no
entries on D's columns, so the Schur complement of the [R D] rows is
exactly D and rank(A) = 100000 + rank(D) — while the engine still has to
do real elimination work (R's entries reach through T).

Exercises at scale: vectorized pivot extraction + staging, the
eliminator's chunk builder, checkpoint cadence, and a finisher.
"""
import numpy as np
import pytest

from spasm_tpu.csr import COO
from spasm_tpu import echelonize, EchelonizeOptions
from spasm_tpu.dense.elim import dense_rank

pytestmark = pytest.mark.slow

N = 100_000
ND, MD = 400, 600


def _build(p=42013, seed=5):
    rng = np.random.default_rng(seed)
    rows = [np.arange(N, dtype=np.int64)]          # unit diagonal of T
    cols = [np.arange(N, dtype=np.int64)]
    vals = [np.ones(N, np.int64)]
    # two strictly-upper entries per T row
    for _ in range(2):
        r = np.arange(N - 1, dtype=np.int64)
        c = r + 1 + rng.integers(0, np.maximum(N - 1 - r, 1))
        c = np.minimum(c, N - 1)
        keep = c > r
        rows.append(r[keep])
        cols.append(c[keep])
        vals.append(rng.integers(1, p, keep.sum()))
    # D block: rank <= 280 by construction (outer product)
    B1 = rng.integers(1, p, (ND, 280)).astype(np.int64)
    B2 = rng.integers(1, p, (280, MD)).astype(np.int64)
    D = (B1 @ B2) % p
    dr, dc = np.nonzero(D)
    rows.append(N + dr)
    cols.append(N + dc)
    vals.append(D[dr, dc])
    # coupling R: 3 entries per D row into T's columns
    rr = np.repeat(N + np.arange(ND, dtype=np.int64), 3)
    rc = rng.integers(0, N, ND * 3)
    rows.append(rr)
    cols.append(rc)
    vals.append(rng.integers(1, p, ND * 3))
    T = COO.from_entries(N + ND, N + MD, p,
                         np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals))
    T.n, T.m = N + ND, N + MD
    Dbal = np.where(D > p // 2, D - p, D).astype(np.int32)
    return T.tocsr(), dense_rank(Dbal, p, force="host")


def test_scale_100k_rows_with_checkpoint(tmp_path):
    A, rank_D = _build()
    assert A.n >= 100_000
    opts = EchelonizeOptions(
        checkpoint_file=str(tmp_path / "scale.ckpt"),
        checkpoint_interval_s=5.0)
    fact = echelonize(A, opts)
    assert fact.r == N + rank_D


def test_scale_100k_complete_pluq():
    """Complete PLUQ at >= 1e5 rows (the analog of the reference's
    LongTest full-LU runs, /root/reference/tests/CMakeLists.txt:43-44):
    A == L @ U verified on random probe vectors."""
    from spasm_tpu.spmv import xApy
    A, rank_D = _build(seed=9)
    fact = echelonize(A.copy(), EchelonizeOptions(L=True, complete=True))
    assert fact.r == N + rank_D and fact.complete
    L, U = fact.L, fact.U
    F = A.field
    rng = np.random.default_rng(2)
    for _ in range(3):
        x = rng.integers(-(A.prime // 2), A.prime // 2, A.n)
        yA = np.zeros(A.m, np.int64)
        xApy(x, A, yA)
        t = np.zeros(L.m, np.int64)
        xApy(x, L, t)
        yLU = np.zeros(U.m, np.int64)
        xApy(t, U, yLU)
        assert np.array_equal(F.narray(yA), F.narray(yLU))
