"""Echelonization property tests (ports of tests/echelonize.c, schur.c).

Self-verification style of the reference: check U is in REF (unit pivots,
pivot first on its row, no two pivots on one column), and that
rowspan(A) == rowspan(U) via deterministic triangular-solve inclusion.
"""
import numpy as np
import pytest

from spasm_tpu import sio, echelonize, EchelonizeOptions, rref
from spasm_tpu.triangular import sparse_triangular_solve
from spasm_tpu.pivots import find_structural_pivots
from spasm_tpu.schur import schur_sparse, estimate_density
from spasm_tpu.echelonize import LU
from tests.conftest import ALL_TEST_MATRICES, ALL_MODULI, SMALL_MODULI

FAST = ["singular.sms", "small.sms", "m1.sms", "upper_trapeze.sms",
        "lower_trapeze.sms", "rectangular_h.sms", "rectangular_l.sms",
        "void.sms", "empty.sms", "dm.sms", "G2.sms", "p3.sms", "t1.sms",
        "cc.sms", "chains.sms", "singular2.sms", "singular3.sms"]


def echelon_form_check(U, qinv_out=None):
    m = U.m
    qinv = np.full(m, -1, np.int64)
    for i in range(U.n):
        cols, vals = U.row(i)
        assert cols.size > 0, f"row {i} of U is empty"
        j = int(cols[0])
        assert qinv[j] == -1, "pivot under another pivot"
        assert vals[0] == 1, "pivot not unitary"
        qinv[j] = i
    if qinv_out is not None:
        assert np.array_equal(qinv, np.asarray(qinv_out, np.int64))
    return qinv


def inclusion_check(A, U, qinv):
    """Every row of A reduces to zero against U (deterministic)."""
    x = np.zeros(A.m, dtype=np.int64)
    for i in range(A.n):
        pattern, x = sparse_triangular_solve(U, A, i, qinv, x)
        bad = pattern[(qinv[pattern] < 0) & (x[pattern] != 0)]
        assert bad.size == 0, f"row {i} of A not in rowspan(U)"


# full reference modulus grid (tests/CMakeLists.txt:46-53): every digit
# tier of the device arithmetic (d=2/3/4) runs through the whole engine
@pytest.mark.parametrize("p", ALL_MODULI)
@pytest.mark.parametrize("name", FAST)
def test_echelonize_properties(matrix_dir, name, p):
    A, _ = sio.load_csr(matrix_dir / name, p)
    fact = echelonize(A)
    U = fact.U
    assert U.m == A.m and U.n <= A.n and U.n <= U.m
    qinv = echelon_form_check(U, fact.qinv)
    inclusion_check(A, U, qinv)


@pytest.mark.parametrize("name", ["medium.sms", "mat364.sms",
                                  "trefethen_500.sms",
                                  "BIOMD0000000424.int.mpl.sms"])
def test_echelonize_medium(matrix_dir, name):
    A, _ = sio.load_csr(matrix_dir / name, 257)
    fact = echelonize(A)
    qinv = echelon_form_check(fact.U, fact.qinv)
    inclusion_check(A, fact.U, qinv)


def test_rref_properties(matrix_dir):
    A, _ = sio.load_csr(matrix_dir / "singular.sms", 257)
    fact = echelonize(A)
    R, Rqinv = rref(fact)
    # RREF: pivot first, unit, and no entries on other pivot columns
    for i in range(R.n):
        cols, vals = R.row(i)
        assert Rqinv[cols[0]] == i
        assert vals[0] == 1
        assert np.all(Rqinv[cols[1:]] < 0)
    qinv = echelon_form_check(R)
    inclusion_check(A, R, qinv)


@pytest.mark.parametrize("name", ["trefethen_500.sms", "singular.sms",
                                  "mat364.sms"])
def test_gplu_finisher(matrix_dir, name):
    """Force the sparse GPLU finisher (dense + low-rank disabled) and
    check the result matches the default engine's rank + properties.
    Exercises the native chunked path with the incremental U buffer."""
    A, _ = sio.load_csr(matrix_dir / name, 257)
    ref = echelonize(A.copy())
    opts = EchelonizeOptions(enable_dense=False,
                             enable_tall_and_skinny=False)
    fact = echelonize(A, opts)
    assert fact.r == ref.r
    qinv = echelon_form_check(fact.U, fact.qinv)
    inclusion_check(A, fact.U, qinv)


def test_gplu_finisher_with_L(matrix_dir):
    """GPLU finisher in complete-LU mode: A == L @ U."""
    A, _ = sio.load_csr(matrix_dir / "singular.sms", 257)
    opts = EchelonizeOptions(complete=True, enable_dense=False,
                             enable_tall_and_skinny=False)
    fact = echelonize(A, opts)
    F = A.field
    LU_ = F.narray(fact.L.todense().astype(object)
                   @ fact.U.todense().astype(object))
    assert np.array_equal(LU_, A.todense())


@pytest.mark.parametrize("name", FAST)
def test_schur_no_entries_under_pivots(matrix_dir, name):
    """Port of tests/schur.c: the Schur complement has no entries on
    pivotal columns."""
    p = 257
    A, _ = sio.load_csr(matrix_dir / name, p)
    if A.nnz == 0:
        pytest.skip("empty matrix")
    from spasm_tpu.echelonize import _Engine
    eng = _Engine(A, EchelonizeOptions())
    npiv, perm = eng.extract_structural(A, None)
    U = eng.U.snapshot_csr()
    fact_view = LU(eng.U.n, U, eng.U.qinv)
    S, p_out = schur_sparse(A, perm[npiv:], A.n - npiv, fact_view,
                            -1, None, None, eliminator=eng.elim)
    assert S.n == A.n - npiv
    if S.nnz:
        assert np.all(eng.U.qinv[S.indices[:S.nnz]] < 0)
    # rank is preserved: rank(A) == npiv + rank(S)
    from spasm_tpu.dense.elim import dense_rank
    rA = dense_rank(A.todense(), p)
    rS = dense_rank(S.todense(), p)
    assert rA == npiv + rS


@pytest.mark.parametrize("name", FAST)
def test_schur_scalar_device_agree(matrix_dir, name):
    """The device block eliminator and the scalar GP solver must produce
    identical Schur complements."""
    p = 65537
    A, _ = sio.load_csr(matrix_dir / name, p)
    if A.nnz == 0:
        pytest.skip("empty matrix")
    from spasm_tpu.echelonize import _Engine
    eng = _Engine(A, EchelonizeOptions())
    npiv, perm = eng.extract_structural(A, None)
    U = eng.U.snapshot_csr()
    fact_view = LU(eng.U.n, U, eng.U.qinv)
    S1, _ = schur_sparse(A, perm[npiv:], A.n - npiv, fact_view, -1,
                         None, None, eliminator=eng.elim, use_device=True)
    S2, _ = schur_sparse(A, perm[npiv:], A.n - npiv, fact_view, -1,
                         None, None, eliminator=None, use_device=False)
    assert np.array_equal(S1.todense(), S2.todense())


def test_schur_device_wide_matrix():
    """The device sparse-Schur path at >= 2^18 columns (the round-2
    ceiling was m <= 65536) matches the scalar oracle."""
    import numpy as np
    from spasm_tpu.csr import COO
    from spasm_tpu.pivots import find_structural_pivots
    from spasm_tpu.schur import schur_sparse
    p = 42013
    m = (1 << 18) + 5
    n = 192
    rng = np.random.default_rng(11)
    rows = np.repeat(np.arange(n, dtype=np.int64), 4)
    cols = rng.integers(0, m, n * 4)
    vals = rng.integers(1, p, n * 4)
    T = COO.from_entries(n, m, p, rows, cols, vals)
    T.n, T.m = n, m
    A = T.tocsr()
    npiv, perm, pinv, qinv, lev = find_structural_pivots(A)
    assert npiv > 0
    from spasm_tpu.dense.block import UEliminator
    from spasm_tpu.echelonize import _Engine, EchelonizeOptions
    eng = _Engine(A, EchelonizeOptions())
    npiv2, perm2 = eng.extract_structural(A, None)
    fact_view = LU(eng.U.n, eng.U.snapshot_csr(), eng.U.qinv)
    S_dev, p_dev = schur_sparse(A, perm2[npiv2:], A.n - npiv2, fact_view,
                                -1, None, None, eliminator=eng.elim,
                                use_device=True)
    S_host, p_host = schur_sparse(A, perm2[npiv2:], A.n - npiv2,
                                  fact_view, -1, None, None,
                                  eliminator=None, use_device=False)
    assert np.array_equal(p_dev, p_host)
    assert np.array_equal(S_dev.indptr, S_host.indptr)
    assert np.array_equal(S_dev.indices, S_host.indices)
    assert np.array_equal(S_dev.data, S_host.data)


def test_device_finisher_rowspan_dependent_rows():
    """Rows lying exactly in the structural pivots' rowspan must yield
    NO finisher pivots (regression: reference-slot scatter values used
    to leak into the reduced basis' dead column, where such rows could
    claim a false pivot and corrupt the rank upper-bound bookkeeping)."""
    import numpy as np
    from spasm_tpu.csr import CSR
    from spasm_tpu import echelonize, EchelonizeOptions
    p = 42013
    rng = np.random.default_rng(11)
    D = np.where(rng.random((60, 80)) < 0.2,
                 rng.integers(1, p, (60, 80)), 0).astype(np.int64)
    # duplicate a batch of rows (dependent but nonzero)
    A = np.vstack([D, D[:25] * 3 % p])
    M = CSR.from_dense(A % p, p)
    r_host = echelonize(M.copy(), EchelonizeOptions(
        enable_dense=False)).r
    fact = echelonize(M.copy(), EchelonizeOptions(device_dense_min=0))
    assert fact.r == r_host
    # every U pivot column must be a REAL column (never the dead pad)
    assert fact.qinv.size == M.m
    U = fact.U
    for i in range(U.n):
        c, v = U.row(i)
        assert v[0] == 1 and c[0] < M.m
