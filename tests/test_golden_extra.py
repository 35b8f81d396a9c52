"""Golden conformance tests against the reference's orphaned
tests/Expected artifacts.

The reference ships 15 Expected/* files but its current CMakeLists only
wires 4 of them (prng, hash/sha, gaxpy.1, submatrix.1 — all asserted in
test_prng.py / test_io_csr.py).  The remaining 11 have NO surviving
driver (`ls /root/reference/tests/*.c` shows no reach.c / io.c /
concatenation.c; vec_perm.c is a self-checking TAP test that prints no
golden output).  Provenance was recovered by exhaustive search for
three of them:

  reach.3  = topological reach of row 5  of upper_trapeze.sms through
             its leftmost-entry pivot structure (spasm_reach semantics,
             /root/reference/src/spasm_reach.c:98-135)
  reach.4  = same, row 24
  concatenation.1 = medium.sms stacked on top of a 5x128 tail matrix
             reconstructed below byte-for-byte

The other eight (reach.1-2, io.1-3, perm.1-2, submatrix.2) depend on
hand-built inputs or glibc rand() streams from drivers that no longer
exist in the reference tree; they are documented as unrecoverable in
PARITY.md.
"""
import io
import os

import numpy as np
import pytest

from spasm_tpu import sio
from spasm_tpu.csr import COO
import spasm_tpu.triangular as triangular

REF_EXPECTED = "/root/reference/tests/Expected"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EXPECTED),
    reason="reference Expected/ directory not available")


def _leftmost_qinv(A):
    qinv = np.full(A.m, -1, np.int64)
    for i in range(A.n):
        cols, _ = A.row(i)
        if cols.size:
            qinv[cols.min()] = i
    return qinv


@pytest.mark.parametrize("golden,row", [("reach.3", 5), ("reach.4", 24)])
def test_reach_golden(matrix_dir, golden, row):
    A, _ = sio.load_csr(str(matrix_dir / "upper_trapeze.sms"), 42013)
    qinv = _leftmost_qinv(A)
    r = triangular.reach(A, A, row, qinv)
    expected = [int(x) for x in
                open(f"{REF_EXPECTED}/{golden}").read().split()]
    assert list(r) == expected


def test_concatenation_golden(matrix_dir):
    """Vertical stack (the `stack` tool's operation, tools/stack.c) of
    medium.sms over the reconstructed 5x128 tail reproduces
    Expected/concatenation.1 byte-for-byte."""
    A, _ = sio.load_csr(str(matrix_dir / "medium.sms"), 42013)
    # tail rows (1-based cols): row 1: (1,1) (65,2) (128,1);
    # row k=2..5: (129-k, k)
    rows = [0, 0, 0, 1, 2, 3, 4]
    cols = [0, 64, 127, 126, 125, 124, 123]
    vals = [1, 2, 1, 2, 3, 4, 5]
    T = COO.from_entries(5, 128, 42013, rows, cols, vals)
    T.n, T.m = 5, 128
    B = T.tocsr()
    # stack A over B
    n = A.n + B.n
    indptr = np.concatenate([A.indptr, A.indptr[-1] + B.indptr[1:]])
    S = type(A)(n, 128, A.field, indptr,
                np.concatenate([A.indices, B.indices]),
                np.concatenate([A.data, B.data]))
    buf = io.StringIO()
    sio.save_csr(S, buf)
    expected = open(f"{REF_EXPECTED}/concatenation.1").read()
    assert buf.getvalue() == expected


# ---------------------------------------------------------------------------
# Round-4 recoveries: io.1/io.2, perm.1/perm.2, submatrix.2 (provenance
# rediscovered by structural analysis / exhaustive fixture search; see
# PARITY.md "Expected/ artifact accounting").


def _parse_sms_entries(path, one_based=True):
    """Raw (rows, cols, vals) of an SMS body (terminator dropped)."""
    toks = open(path).read().split()
    has_header = toks[2] == "M"
    body = toks[3:] if has_header else toks
    a = np.asarray(body, dtype=np.int64).reshape(-1, 3)
    if has_header and a[-1, 0] == 0 and a[-1, 1] == 0:
        a = a[:-1]
    off = 1 if one_based else 0
    return a[:, 0] - off, a[:, 1] - off, a[:, 2]


def _io1_triplets():
    return _parse_sms_entries(f"{REF_EXPECTED}/io.1")


def test_io_golden_compress():
    """io.2 == spasm_compress(io.1): the reference's counting sort is
    stable BY ROW ONLY (each row keeps insertion order,
    spasm_triplet.c:99-158); our compress additionally sorts columns
    within rows, so byte parity is shown through an explicit stable row
    sort, and semantic parity through the dense matrices."""
    r, c, v = _io1_triplets()
    # byte-for-byte with the reference's ordering
    order = np.argsort(r, kind="stable")
    from spasm_tpu.csr import CSR
    from spasm_tpu.field import Field
    indptr = np.zeros(5, np.int64)
    np.add.at(indptr, r + 1, 1)
    np.cumsum(indptr, out=indptr)
    A_ref = CSR(4, 4, Field(42013), indptr, c[order].astype(np.int32),
                v[order].astype(np.int32))
    buf = io.StringIO()
    sio.save_csr(A_ref, buf)
    assert buf.getvalue() == open(f"{REF_EXPECTED}/io.2").read()
    # our compress: same matrix
    T = COO.from_entries(4, 4, 42013, r, c, v)
    T.n, T.m = 4, 4
    assert np.array_equal(T.tocsr().todense(), A_ref.todense())


def test_perm_golden():
    """perm.1 = io.1's matrix with rows reversed; perm.2 = rows AND
    columns reversed (the vec_perm driver's P.A.Q^-1 with reversal
    permutations).  Asserted at matrix level: the golden files are
    0-based triplet dumps in the driver's own print order."""
    r, c, v = _io1_triplets()
    T = COO.from_entries(4, 4, 42013, r, c, v)
    T.n, T.m = 4, 4
    A = T.tocsr()
    rev = np.arange(3, -1, -1)

    def dense_of(path):
        rr, cc, vv = _parse_sms_entries(path, one_based=False)
        D = np.zeros((4, 4), np.int64)
        D[rr, cc] = vv
        return D

    P1 = A.permute(p=rev)
    assert np.array_equal(P1.todense(), dense_of(f"{REF_EXPECTED}/perm.1"))
    P2 = A.permute(p=rev, qinv=rev)
    assert np.array_equal(P2.todense(), dense_of(f"{REF_EXPECTED}/perm.2"))


def test_submatrix2_golden(matrix_dir):
    """submatrix.2 = the two 5x5 windows m1[0:5, 0:5] and m1[0:5, 5:10]
    of m1.sms mod 46337, concatenated (found by exhaustive window search
    over every fixture)."""
    A, _ = sio.load_csr(str(matrix_dir / "m1.sms"), 46337)
    buf = io.StringIO()
    sio.save_csr(A.submatrix(0, 5, 0, 5), buf)
    sio.save_csr(A.submatrix(0, 5, 5, 10), buf)
    assert buf.getvalue() == open(f"{REF_EXPECTED}/submatrix.2").read()
