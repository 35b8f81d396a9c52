"""Matching / SCC / Dulmage-Mendelsohn tests
(ports of tests/matching.c, scc.c, dm.c)."""
import numpy as np
import pytest

from spasm_tpu import (sio, maximum_matching, structural_rank,
                       dulmage_mendelsohn, strongly_connected_components)
from spasm_tpu.csr import pinv as make_pinv, random_permutation

DM_MATRICES = ["scc.sms", "scc2.sms", "scc3.sms", "mat364.sms", "t1.sms",
               "dm.sms", "dm2.sms", "BIOMD0000000424.int.mpl.sms",
               "BIOMD0000000525.int.mpl.sms"]


@pytest.mark.parametrize("name", DM_MATRICES)
def test_matching_valid(matrix_dir, name):
    A, _ = sio.load_csr(matrix_dir / name, 257)
    size, jmatch, imatch = maximum_matching(A)
    # consistency
    D = A.todense()
    cnt = 0
    for i in range(A.n):
        j = jmatch[i]
        if j >= 0:
            assert imatch[j] == i
            assert D[i, j] != 0 or True  # pattern matching: entry exists
            assert np.any(A.row(i)[0] == j)
            cnt += 1
    assert cnt == size
    # maximality vs rank upper bound: structural rank >= true rank
    from tests.test_dense import np_rank
    assert size >= np_rank(D, 257) or A.n > A.m  # matching on A as given


@pytest.mark.parametrize("name", DM_MATRICES)
def test_structural_rank_bounds(matrix_dir, name):
    A, _ = sio.load_csr(matrix_dir / name, 257)
    from tests.test_dense import np_rank
    sr = structural_rank(A)
    assert np_rank(A.todense(), 257) <= sr <= min(A.n, A.m)


@pytest.mark.parametrize("name", ["scc.sms", "scc2.sms", "scc3.sms"])
def test_scc_blocks(matrix_dir, name):
    A, _ = sio.load_csr(matrix_dir / name, 257)
    assert A.n == A.m
    P = strongly_connected_components(A)
    n = A.n
    # p is a permutation
    assert sorted(P.p.tolist()) == list(range(n))
    # permuted matrix is block upper triangular w.r.t. blocks r
    D = A.todense()[P.p][:, P.p] != 0
    for b in range(P.nb):
        lo, hi = P.r[b], P.r[b + 1]
        assert not np.any(D[hi:, lo:hi]), "entry below SCC diagonal block"


@pytest.mark.parametrize("name", DM_MATRICES)
def test_dm_properties(matrix_dir, name):
    """Port of tests/dm.c: permutations bijective + block structure after
    a random pre-permutation."""
    rng = np.random.default_rng(3)
    A0, _ = sio.load_csr(matrix_dir / name, 257)
    p0 = random_permutation(A0.n, rng)
    q0 = random_permutation(A0.m, rng)
    A = A0.permute(p0, make_pinv(q0, A0.m))
    DM = dulmage_mendelsohn(A)
    n, m = A.n, A.m
    assert sorted(DM.p.tolist()) == list(range(n))
    assert sorted(DM.q.tolist()) == list(range(m))
    rr, cc = DM.rr, DM.cc
    assert rr[0] == 0 and rr[4] == n
    assert cc[0] == 0 and cc[4] == m
    # block structure: in A(p,q), the H block rows (R1) have no entries
    # outside columns C0+C1; V rows (R3+R0) confined to C3
    D = A.todense()[DM.p][:, DM.q] != 0
    # rows of S (R2) have no entries in C0/C1
    assert not np.any(D[rr[1]:rr[2], :cc[2]])
    # rows of V = R3 + R0 have no entries left of C3
    assert not np.any(D[rr[2]:, :cc[3]])
    # every row in R1 is matched to a column in C1, etc: matching size
    # equals n - |R0| = rr[3]... (structural property, weak check)
    assert rr[2] - rr[1] == cc[3] - cc[2]     # S block is square


def test_dm_empty_and_square(matrix_dir):
    A, _ = sio.load_csr(matrix_dir / "void.sms", 257)
    DM = dulmage_mendelsohn(A)
    assert sorted(DM.p.tolist()) == list(range(A.n))
