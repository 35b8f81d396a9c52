"""Device dense mod-p kernels vs an exact numpy reference.

Covers the 6-modulus grid of the reference test-suite (float/double/i64
FFPACK regimes + the 2^32-5 extreme), rank deficiency, rectangular shapes.
"""
import numpy as np
import pytest

from spasm_tpu.field import Field
from spasm_tpu.dense import modp_matmul, dense_rref, dense_lu
from spasm_tpu.dense.elim import dense_rank
from tests.conftest import ALL_MODULI


def np_rank(S, p):
    """Plain exact Gaussian elimination rank (reference oracle)."""
    A = np.asarray(S, np.int64) % p
    if (p - 1) ** 2 >= 2 ** 63:   # np.outer below would overflow int64
        A = A.astype(object)
    n, m = A.shape
    r = 0
    for j in range(m):
        if r == n:
            break
        nz = np.nonzero(A[r:, j])[0]
        if nz.size == 0:
            continue
        i = r + nz[0]
        A[[r, i]] = A[[i, r]]
        inv = pow(int(A[r, j]), -1, p)
        A[r] = (A[r] * inv) % p
        fac = A[:, j].copy()
        fac[r] = 0
        A = (A - np.outer(fac, A[r])) % p
        r += 1
    return r


def random_matrix(n, m, p, rank=None, seed=0):
    rng = np.random.default_rng(seed)
    F = Field(p)
    if rank is None:
        return F.narray(rng.integers(0, p, size=(n, m)))
    X = F.narray(rng.integers(0, p, size=(n, rank)))
    Y = F.narray(rng.integers(0, p, size=(rank, m)))
    return F.narray(X.astype(object) @ Y.astype(object)) \
        if p > 2**31 else F.narray(X.astype(np.int64) @ Y.astype(np.int64)
                                   % p)


@pytest.mark.parametrize("p", ALL_MODULI)
def test_modp_matmul(p):
    rng = np.random.default_rng(42)
    F = Field(p)
    A = F.narray(rng.integers(0, p, size=(33, 57)))
    B = F.narray(rng.integers(0, p, size=(57, 29)))
    got = modp_matmul(A, B, p)
    want = F.narray((A.astype(object) @ B.astype(object)))
    assert np.array_equal(np.asarray(got), want)


def test_modp_matmul_deep_contraction():
    p = 4294967291
    rng = np.random.default_rng(1)
    F = Field(p)
    k = 70000          # crosses the K_CHUNK boundary
    A = F.narray(rng.integers(0, p, size=(4, k)))
    B = F.narray(rng.integers(0, p, size=(k, 3)))
    got = np.asarray(modp_matmul(A, B, p))
    want = F.narray(A.astype(object) @ B.astype(object))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("p", ALL_MODULI)
@pytest.mark.parametrize("shape,rank", [((20, 30), None), ((30, 20), None),
                                        ((25, 25), 10), ((40, 15), 7),
                                        ((15, 40), 5)])
def test_dense_rref_properties(p, shape, rank):
    n, m = shape
    S = random_matrix(n, m, p, rank, seed=n * m + p % 97)
    F = Field(p)
    R, pivcols = dense_rref(S, p, force="device")
    Rh, pivcolsh = dense_rref(S, p, force="host")
    assert np.array_equal(R, Rh) and np.array_equal(pivcols, pivcolsh)
    r = len(pivcols)
    assert r == np_rank(S, p)
    if r == 0:
        return
    # RREF shape: unit pivots, zero elsewhere on pivot columns
    P = R[:, pivcols]
    assert np.array_equal(P, np.eye(r, dtype=np.int32))
    # rowspan(S) subset of rowspan(R): one reduction step must annihilate
    coeffs = S[:, pivcols]
    resid = F.narray(S.astype(np.int64)
                     - coeffs.astype(np.int64) @ R.astype(np.int64) % p)
    if p > 2**15:   # int64 product overflow guard for big p
        resid = F.narray(S.astype(object) - coeffs.astype(object)
                         @ R.astype(object))
    assert not np.any(resid)


@pytest.mark.parametrize("p", ALL_MODULI)
@pytest.mark.parametrize("shape,rank", [((20, 30), None), ((30, 20), 12),
                                        ((25, 25), 25), ((16, 16), 3)])
def test_dense_lu_properties(p, shape, rank):
    n, m = shape
    S = random_matrix(n, m, p, rank, seed=n + m + p % 89)
    F = Field(p)
    r, prows, pivcols, L, U = dense_lu(S, p, force="device")
    rh, prowsh, pivcolsh, Lh, Uh = dense_lu(S, p, force="host")
    assert (r, list(prows), list(pivcols)) == (rh, list(prowsh), list(pivcolsh))
    assert np.array_equal(L, Lh) and np.array_equal(U, Uh)
    assert r == np_rank(S, p)
    # unit pivots on U
    if r:
        assert np.array_equal(U[np.arange(r), pivcols], np.ones(r, np.int32))
        # pivot rows of L: L[prows[k], l] == 0 for l > k
        Lp = L[prows]
        assert not np.any(np.triu(Lp, 1))
    # exact reconstruction S == L @ U
    prod = F.narray(L.astype(object) @ U.astype(object)) if r else \
        np.zeros_like(S)
    assert np.array_equal(prod, S)


def test_dense_rank_edge_cases():
    p = 257
    assert dense_rank(np.zeros((5, 8), np.int32), p, force="device") == 0
    assert dense_rank(np.eye(6, dtype=np.int32), p) == 6
    one = np.zeros((3, 3), np.int32)
    one[2, 2] = 5
    assert dense_rank(one, p) == 1
