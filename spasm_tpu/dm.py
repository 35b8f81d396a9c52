"""Dulmage-Mendelsohn decomposition and strongly connected components.

Ports of /root/reference/src/spasm_dm.c and spasm_scc.c:
  * coarse DM: a maximum matching (on A or A^T, whichever is wider) and
    two BFS sweeps over alternating paths determine the H/S/V blocks;
  * fine DM: iterative Tarjan SCC of the square S block.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .csr import CSR, pinv as make_pinv
from .matching import maximum_matching


@dataclasses.dataclass
class DM:
    """Mirror of struct spasm_dm (spasm.h:74-82)."""
    p: np.ndarray       # (n,) row permutation
    q: np.ndarray       # (m,) column permutation
    r: np.ndarray       # (nb+1,) row block boundaries in A(p,q)
    c: np.ndarray       # (nb+1,) column block boundaries
    nb: int
    rr: np.ndarray      # (5,) coarse row decomposition
    cc: np.ndarray      # (5,) coarse column decomposition


def _bfs(A: CSR, wi, wj, queue, imatch, jmatch, mark):
    """BFS over alternating paths from unmatched rows (spasm_dm.c:21-59)."""
    indptr, indices = A.indptr, A.indices
    n = A.n
    tail = 0
    for i in range(n):
        if jmatch[i] >= 0:
            continue
        wi[i] = 0
        queue[tail] = i
        tail += 1
    head = 0
    while head < tail:
        i = queue[head]
        head += 1
        for j in indices[indptr[i]:indptr[i + 1]]:
            if wj[j] >= 0:
                continue
            wj[j] = mark
            I = imatch[j]
            if wi[I] >= 0:
                continue
            wi[I] = mark
            queue[tail] = I
            tail += 1


def strongly_connected_components(A: CSR) -> DM:
    """Iterative Tarjan SCC of a square matrix's digraph, emitting a block
    permutation (spasm_scc.c:14-117).  Blocks appear in topological order.
    """
    n, m = A.n, A.m
    assert n == m
    indptr, indices = A.indptr, A.indices
    index = np.full(n, -1, dtype=np.int64)       # discovery marks
    low = np.zeros(n, dtype=np.int64)
    onstack = np.zeros(n, dtype=bool)
    sccstack = []
    blocks = []
    counter = 0
    for root in range(n):
        if index[root] >= 0:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                sccstack.append(v)
                onstack[v] = True
            advanced = False
            lo, hi = indptr[v], indptr[v + 1]
            while pi < hi - lo:
                w = indices[lo + pi]
                pi += 1
                if index[w] < 0:
                    work[-1] = (v, pi)
                    work.append((int(w), 0))
                    advanced = True
                    break
                elif onstack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = sccstack.pop()
                    onstack[w] = False
                    comp.append(w)
                    if w == v:
                        break
                blocks.append(comp)
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    # blocks discovered in reverse topological order -> reverse them
    blocks.reverse()
    p = np.concatenate([np.asarray(b[::-1], np.int64) for b in blocks]) \
        if blocks else np.empty(0, np.int64)
    rr = np.zeros(len(blocks) + 1, dtype=np.int64)
    for k, b in enumerate(blocks):
        rr[k + 1] = rr[k] + len(b)
    return DM(p=p, q=p.copy(), r=rr.copy(), c=rr.copy(),
              nb=len(blocks), rr=np.zeros(5, np.int64),
              cc=np.zeros(5, np.int64))


def dulmage_mendelsohn(A: CSR) -> DM:
    """Coarse + fine DM decomposition (spasm_dm.c:90-176)."""
    n, m = A.n, A.m
    At = A.transpose(keep_values=False)
    if n < m:
        _, jmatch, imatch = maximum_matching(A)
    else:
        _, imatch, jmatch = maximum_matching(At)

    p = np.empty(n, dtype=np.int64)
    q = np.empty(m, dtype=np.int64)
    rr = np.zeros(5, dtype=np.int64)
    cc = np.zeros(5, dtype=np.int64)
    wi = np.full(n, -1, dtype=np.int64)
    wj = np.full(m, -1, dtype=np.int64)

    # find R0, then R3, C3 / find C0, then R1, C1
    _bfs(A, wi, wj, p, imatch, jmatch, 3)
    _bfs(At, wj, wi, q, jmatch, imatch, 1)

    # collect in q: C0, C1, C2, C3 ; p: R1, R2, R3, R0
    kc = 0
    for j in range(m):            # C0: unmatched columns
        if wj[j] == 0:
            q[kc] = j
            kc += 1
    cc[1] = kc
    kr = 0
    for mark, cset in ((1, 1), (2, -1), (3, 3)):
        for j in range(m):
            if wj[j] != cset:
                continue
            p[kr] = imatch[j]
            kr += 1
            q[kc] = j
            kc += 1
        cc[mark + 1] = kc
        rr[mark] = kr
    for i in range(n):            # R0: unmatched rows
        if wi[i] == 0:
            p[kr] = i
            kr += 1
    rr[4] = kr
    cc[4] = kc

    nb = 1
    r = np.asarray([0, n], dtype=np.int64)
    c = np.asarray([0, m], dtype=np.int64)
    out = DM(p=p, q=q, r=r, c=c, nb=nb, rr=rr, cc=cc)

    # ---- fine decomposition: SCC of the square S block ----
    if rr[2] - rr[1] == 0:
        return out
    qinv = make_pinv(q, m)
    B = A.permute(p, qinv, with_values=False)
    C = B.submatrix(int(rr[1]), int(rr[2]), int(cc[2]), int(cc[3]),
                    with_values=False)
    SCC = strongly_connected_components(C)
    n_scc = SCC.nb
    # update permutations in the S range
    p[rr[1]:rr[2]] = p[rr[1]:rr[2]][SCC.p]
    q[cc[2]:cc[3]] = q[cc[2]:cc[3]][SCC.q]
    r = np.zeros(n_scc + 3, dtype=np.int64)
    c = np.zeros(n_scc + 3, dtype=np.int64)
    for i in range(n_scc + 1):
        r[i + 1] = rr[1] + SCC.r[i]
        c[i + 1] = cc[2] + SCC.c[i]
    r[n_scc + 2] = n
    c[n_scc + 2] = m
    out.r, out.c, out.nb = r, c, n_scc + 2
    return out
