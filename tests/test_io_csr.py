"""I/O, compress, transpose, permute, submatrix tests."""
import io

import numpy as np
import pytest

from spasm_tpu import sio
from spasm_tpu.csr import COO, CSR, pinv, random_permutation
from spasm_tpu.spmv import xApy
from tests.conftest import ALL_TEST_MATRICES


def test_load_small(matrix_dir):
    A, h = sio.load_csr(matrix_dir / "singular.sms", 42013, want_hash=True)
    assert A.n == 16 and A.m == 16
    assert h is not None and len(h) == 32


def test_hash_is_file_sha256(matrix_dir):
    import hashlib
    raw = (matrix_dir / "singular.sms").read_bytes()
    _, h = sio.load_csr(matrix_dir / "singular.sms", 42013, want_hash=True)
    assert h == hashlib.sha256(raw).digest()


def test_spmv_golden(matrix_dir, expected_dir):
    """Port of tests/spmv.c vs Expected/gaxpy.1."""
    A, _ = sio.load_csr(matrix_dir / "m1.sms", 257)
    n = A.n
    x = A.field.narray(np.arange(1, n + 1))
    y = np.zeros(n, dtype=np.int32)
    xApy(x, A, y)
    golden = [int(t) for t in
              (expected_dir / "gaxpy.1").read_text().split()]
    assert list(y) == golden


def test_submatrix_golden(matrix_dir, expected_dir):
    """Port of tests/submatrix.c vs Expected/submatrix.1."""
    A, _ = sio.load_csr(matrix_dir / "singular.sms", 46337)
    S = A.submatrix(5, 10, 5, 10)
    buf = io.StringIO()
    sio.save_csr(S, buf)
    assert buf.getvalue().splitlines() == \
        (expected_dir / "submatrix.1").read_text().splitlines()


def test_save_load_roundtrip(matrix_dir):
    A, _ = sio.load_csr(matrix_dir / "medium.sms", 257)
    buf = io.StringIO()
    sio.save_csr(A, buf)
    B, _ = sio.load_csr(io.BytesIO(buf.getvalue().encode()), 257)
    assert np.array_equal(A.todense(), B.todense())


def test_compress_dedup_and_zero_removal():
    # duplicates sum mod p; values that reduce to 0 disappear
    T = COO.from_entries(3, 3, 7, [0, 0, 1, 1, 2],
                         [1, 1, 2, 2, 0], [3, 4, 5, 2, 14])
    A = T.tocsr()
    D = A.todense()
    assert D[0, 1] == 0          # 3+4 == 0 mod 7
    assert D[1, 2] == 0          # 5+2 == 0 mod 7
    assert D[2, 0] == 0          # 14 == 0 mod 7 (dropped at entry)
    assert A.nnz == 0


@pytest.mark.parametrize("name", ALL_TEST_MATRICES)
def test_transpose_involution(matrix_dir, name):
    A, _ = sio.load_csr(matrix_dir / name, 257)
    T = A.transpose()
    TT = T.transpose()
    assert np.array_equal(A.todense(), TT.todense())
    assert np.array_equal(A.todense().T, T.todense())


def test_permute_matches_dense(matrix_dir):
    rng = np.random.default_rng(0)
    A, _ = sio.load_csr(matrix_dir / "small.sms", 65537)
    p = random_permutation(A.n, rng)
    q = random_permutation(A.m, rng)
    qi = pinv(q, A.m)
    B = A.permute(p, qi)
    D = A.todense()
    # row i of B is row p[i] of A; col j of A goes to col qinv[j]
    expect = D[p][:, q]
    # B has columns permuted by qinv: B[:, qinv[j]] = A[:, j]
    got = B.todense()[:, qi][:, pinv(qi, A.m)]  # identity sanity
    assert np.array_equal(B.todense()[:, qi], D[p] @ np.eye(A.m, dtype=int)
                          [:, :]) or True
    # direct check: B.todense()[i, qinv[j]] == D[p[i], j]
    got = B.todense()
    for i in range(A.n):
        for j in range(A.m):
            assert got[i, qi[j]] == D[p[i], j]
    del expect


def test_submatrix_matches_dense(matrix_dir):
    A, _ = sio.load_csr(matrix_dir / "medium.sms", 257)
    S = A.submatrix(2, 9, 3, 11)
    assert np.array_equal(S.todense(), A.todense()[2:9, 3:11])


def test_pnm_outputs(matrix_dir, tmp_path):
    A, _ = sio.load_csr(matrix_dir / "medium.sms", 257)
    for mode in (1, 2):
        f = tmp_path / f"out.{mode}"
        sio.save_pnm(A, str(f), 10, 10, mode)
        head = f.read_text().splitlines()
        assert head[0] == f"P{mode}"
