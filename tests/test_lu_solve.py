"""Full PLUQ, solve, gesv, kernel and certificate tests
(ports of tests/lu.c, solve.c, gesv.c, kernel.c, rank_cert.c)."""
import io

import numpy as np
import pytest

from spasm_tpu import (sio, echelonize, EchelonizeOptions, solve, gesv,
                       kernel, kernel_from_rref, rref,
                       rank_certificate_create, rank_certificate_verify,
                       factorization_verify, certificate_save,
                       certificate_load)
from spasm_tpu.field import Field
from spasm_tpu.spmv import xApy
from spasm_tpu.hashing import PRNG

FAST = ["singular.sms", "small.sms", "upper_trapeze.sms",
        "lower_trapeze.sms", "rectangular_h.sms", "rectangular_l.sms",
        "dm.sms", "G2.sms", "t1.sms", "singular2.sms", "chains2.sms"]

# full reference modulus grid (tests/CMakeLists.txt:46-53): every device
# digit tier (d=2: 3/257/65537, d=3: 67108859/189812507, d=4: 2^32-5)
from tests.conftest import ALL_MODULI as MODULI  # noqa: E402


def lu_product_dense(fact):
    L = fact.L.todense().astype(object)
    U = fact.U.todense().astype(object)
    F = fact.U.field
    return F.narray(L @ U)


@pytest.mark.parametrize("p", MODULI)
@pytest.mark.parametrize("name", FAST)
def test_complete_lu(matrix_dir, name, p):
    """A == L @ U (tests/lu.c:78-106) + probabilistic verify."""
    A, _ = sio.load_csr(matrix_dir / name, p)
    opts = EchelonizeOptions(complete=True)
    fact = echelonize(A, opts)
    assert fact.L is not None
    assert np.array_equal(lu_product_dense(fact), A.todense())
    assert factorization_verify(A, fact, seed=42)


@pytest.mark.parametrize("name", FAST)
def test_solve_forged_rhs(matrix_dir, name):
    """Forge b = x.A, solve, compare A-application (tests/solve.c)."""
    p = 257
    A, _ = sio.load_csr(matrix_dir / name, p)
    fact = echelonize(A, EchelonizeOptions(complete=True))
    rng = np.random.default_rng(5)
    F = Field(p)
    x = F.narray(rng.integers(0, p, A.n))
    b = np.zeros(A.m, dtype=np.int32)
    xApy(x, A, b)
    ok, y = solve(fact, b.astype(np.int64))
    assert ok
    b2 = np.zeros(A.m, dtype=np.int32)
    xApy(y.astype(np.int32), A, b2)
    assert np.array_equal(b2, b)


def test_solve_rejects_bogus_rhs(matrix_dir):
    p = 257
    A, _ = sio.load_csr(matrix_dir / "singular.sms", p)
    fact = echelonize(A, EchelonizeOptions(complete=True))
    assert fact.r < A.m
    # a random vector is almost surely outside the row space
    rng = np.random.default_rng(7)
    found_reject = False
    for _ in range(10):
        b = Field(p).narray(rng.integers(1, p, A.m)).astype(np.int64)
        ok, _ = solve(fact, b)
        if not ok:
            found_reject = True
            break
    assert found_reject


@pytest.mark.parametrize("name", ["singular.sms", "small.sms", "dm.sms"])
def test_gesv(matrix_dir, name):
    """X.A == B on solvable rows (tests/gesv.c:45-77)."""
    p = 257
    A, _ = sio.load_csr(matrix_dir / name, p)
    fact = echelonize(A, EchelonizeOptions(complete=True))
    # B = A works always: X should satisfy X.A == A
    X, ok = gesv(fact, A)
    assert ok is not None and np.all(ok)
    F = Field(p)
    got = F.narray(X.todense().astype(object) @ fact.L.todense().astype(
        object) if False else X.todense().astype(np.int64))
    # verify row by row through SpMV
    for i in range(A.n):
        xi = np.zeros(X.m, np.int32)
        cols, vals = X.row(i)
        xi[cols] = vals
        b = np.zeros(A.m, np.int32)
        xApy(xi, A, b)
        want = np.zeros(A.m, np.int32)
        ac, av = A.row(i)
        want[ac] = av
        assert np.array_equal(b, want)


@pytest.mark.parametrize("p", MODULI)
@pytest.mark.parametrize("name", FAST)
def test_kernel(matrix_dir, name, p):
    """Every kernel basis vector annihilates A (tests/kernel.c:57-98)."""
    A, _ = sio.load_csr(matrix_dir / name, p)
    fact = echelonize(A)
    K = kernel(fact)
    assert K.n == A.m - fact.r
    At = A.transpose()
    for i in range(K.n):
        x = np.zeros(K.m, np.int32)
        cols, vals = K.row(i)
        assert cols.size > 0
        x[cols] = vals
        y = np.zeros(At.m, np.int32)
        xApy(x, At, y)
        assert not np.any(y), f"kernel row {i} does not annihilate A^T"


def test_kernel_from_rref(matrix_dir):
    p = 257
    A, _ = sio.load_csr(matrix_dir / "singular.sms", p)
    fact = echelonize(A)
    R, Rqinv = rref(fact)
    K = kernel_from_rref(R, Rqinv)
    assert K.n == A.m - fact.r
    At = A.transpose()
    for i in range(K.n):
        x = np.zeros(K.m, np.int32)
        cols, vals = K.row(i)
        x[cols] = vals
        y = np.zeros(At.m, np.int32)
        xApy(x, At, y)
        assert not np.any(y)


@pytest.mark.parametrize("p", MODULI)
@pytest.mark.parametrize("name", ["singular.sms", "small.sms", "G2.sms"])
def test_rank_certificate_roundtrip(matrix_dir, name, p):
    """Create + verify + save/load (tests/rank_cert.c:42-44)."""
    A, h = sio.load_csr(matrix_dir / name, p, want_hash=True)
    fact = echelonize(A, EchelonizeOptions(complete=True))
    proof = rank_certificate_create(A, h, fact)
    assert proof.r == fact.r
    assert rank_certificate_verify(A, h, proof)
    # tampered hash fails
    bad = bytearray(h)
    bad[0] ^= 1
    assert not rank_certificate_verify(A, bytes(bad), proof)
    # save / load roundtrip
    buf = io.StringIO()
    certificate_save(proof, buf)
    buf.seek(0)
    proof2 = certificate_load(buf)
    assert proof2 is not None
    assert rank_certificate_verify(A, h, proof2)


def test_prng_challenge_determinism():
    g1 = PRNG.from_u64(257, 99, 0)
    g2 = PRNG.from_u64(257, 99, 0)
    assert [g1.zzp() for _ in range(64)] == [g2.zzp() for _ in range(64)]
