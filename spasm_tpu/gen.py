"""Deterministic generators for benchmark matrices.

The reference's headline benchmarks (README.md:68-91) are homology
matrices fetched from hpac.imag.fr, which is unreachable from test
environments.  The `mk<n>.b<j>` family, however, is pure combinatorics —
the simplicial boundary maps of the *matching complex* M_n (faces of
dimension j are matchings with j+1 edges of the complete graph K_n) — so
the exact instances can be generated locally:

    mk13.b5  =  boundary_6->5 of M_13   (135135 x 270270, 810810 nnz)

which is one of the three matrices the reference ranks "in a few seconds"
(README.md:68-72).  Row/column orderings are canonical-lexicographic
(ranks and row spaces are permutation-invariant, so every rank/echelonize
benchmark number is directly comparable with the reference's).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .csr import CSR


def _matchings(n: int, k: int) -> np.ndarray:
    """All k-edge matchings of K_n as a (count, k) int32 array of edge
    ids (edge (u, v), u < v, has id u*n + v), each row sorted ascending,
    rows in lexicographic order.

    Enumeration: extend by the lowest-id edge ordering; a matching is
    built in increasing edge-id order, which makes the output naturally
    lex-sorted and duplicate-free.
    """
    edges = [(u, v) for u in range(n) for v in range(u + 1, n)]
    eid = np.asarray([u * n + v for (u, v) in edges], np.int32)
    out: List[List[int]] = []
    stack: List[Tuple[int, int, List[int]]] = [(0, 0, [])]
    # iterative DFS: (next edge index to consider, used-vertex bitmask,
    # chosen edge ids)
    while stack:
        i, used, chosen = stack.pop()
        if len(chosen) == k:
            out.append(chosen)
            continue
        # not enough edges left to finish: prune
        for j in range(len(edges) - 1, i - 1, -1):
            u, v = edges[j]
            if (used >> u) & 1 or (used >> v) & 1:
                continue
            stack.append((j + 1, used | (1 << u) | (1 << v),
                          chosen + [int(eid[j])]))
    return np.asarray(out, np.int32).reshape(len(out), k)


def matching_complex_boundary(n: int, j: int, prime: int = 42013) -> CSR:
    """Boundary map b<j> of the matching complex M_n as a CSR mod prime.

    Rows: (j+1)-edge matchings; columns: j-edge matchings; entry
    (-1)^t at the column obtained by deleting the t-th edge (edges in
    ascending id order) — the standard simplicial boundary with vertices
    replaced by edges of K_n.  Orderings are lexicographic.
    """
    rows_m = _matchings(n, j + 1)            # (R, j+1)
    cols_m = _matchings(n, j)                # (C, j)
    R = rows_m.shape[0]
    # column index: lexicographic rank of each j-matching
    key: Dict[bytes, int] = {m.tobytes(): i for i, m in enumerate(cols_m)}
    nnz = R * (j + 1)
    indices = np.empty(nnz, np.int32)
    data = np.empty(nnz, np.int32)
    for t in range(j + 1):
        face = np.delete(rows_m, t, axis=1)
        sign = 1 if t % 2 == 0 else -1
        col = np.fromiter((key[face[i].tobytes()] for i in range(R)),
                          np.int32, count=R)
        indices[t::j + 1] = col
        data[t::j + 1] = sign
    indptr = np.arange(R + 1, dtype=np.int64) * (j + 1)
    from .field import Field
    # balanced representation: +-1 is its own balanced residue for p > 2
    return CSR(R, cols_m.shape[0], Field(prime), indptr, indices, data)


def synthetic_sparse(n: int, m: int, w: int, p: int, seed: int = 12345
                     ) -> CSR:
    """Random-pattern sparse matrix, ~w nnz/row (bench scaffolding)."""
    from .csr import COO
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), w)
    cols = rng.integers(0, m, size=n * w)
    vals = rng.integers(1, p, size=n * w)
    T = COO.from_entries(n, m, p, rows, cols, vals)
    T.n, T.m = n, m
    return T.tocsr()


def gl7d_like(n: int, m: int, p: int, seed: int = 2024,
              avg_nnz_per_row: float = 12.0) -> CSR:
    """A GL7d-shaped workload: sparse matrix whose LEFTMOST columns are
    much denser than the rest (power-law column-density profile).

    The reference's GL7d14..GL7d22 instances (hpac.imag.fr, unreachable
    offline — /root/reference/README.md:86-91) have this structure: the
    rank tool only completes on them after `vertical_swap` (mirror the
    columns so the dense ones move right, where structural pivot search
    is cheap) with `--dense-threshold 0.01`.  This generator reproduces
    the *workflow-relevant* structure (column-density skew), not the
    exact entries, so the preprocessing + low-threshold-Schur pipeline
    can be exercised and timed end-to-end.
    """
    from .csr import COO
    rng = np.random.default_rng(seed)
    nnz = int(n * avg_nnz_per_row)
    # power-law column choice: density ~ 1 / (j + m/50)
    wgt = 1.0 / (np.arange(m) + m / 50.0)
    wgt /= wgt.sum()
    cols = rng.choice(m, size=nnz, p=wgt)
    rows = rng.integers(0, n, size=nnz)
    vals = rng.integers(1, p, size=nnz)
    T = COO.from_entries(n, m, p, rows, cols, vals)
    T.n, T.m = n, m
    return T.tocsr()
