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
