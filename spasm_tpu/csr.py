"""Sparse containers: COO (triplet) and CSR matrices over GF(p).

Functionally equivalent to the reference's spasm_triplet / spasm_csr
(/root/reference/src/spasm.h:38-62) but with numpy-vectorized bulk
operations instead of per-entry C loops:

  * compress (COO -> CSR) = lexsort + segment-sum dedup + zero removal
    (reference: counting sort then in-place passes, spasm_triplet.c:99-158)
  * transpose = argsort dispatch          (spasm_transpose.c:5-52)
  * permute / submatrix                   (spasm_permutation.c, spasm_submatrix.c)

Conventions shared with the reference:
  * values are balanced int32 representatives (optional: pattern matrices)
  * indptr is int64 (nnz can exceed 2^31), indices are int32
  * rows of a CSR need not be sorted by column (ours usually are)
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .field import Field


@dataclasses.dataclass
class COO:
    """Triplet-form sparse matrix (append-friendly builder)."""
    n: int
    m: int
    field: Field
    row: np.ndarray        # int32
    col: np.ndarray        # int32
    val: Optional[np.ndarray]  # int32 balanced, or None (pattern only)

    @classmethod
    def empty(cls, n: int, m: int, prime: int, with_values: bool = True):
        return cls(n, m, Field(prime),
                   np.empty(0, np.int32), np.empty(0, np.int32),
                   np.empty(0, np.int32) if with_values else None)

    @classmethod
    def from_entries(cls, n: int, m: int, prime: int, rows, cols, vals=None):
        """Bulk constructor.  Values are normalized; entries that reduce to 0
        are dropped (matching spasm_add_entry, spasm_triplet.c:7-24)."""
        F = Field(prime)
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        if vals is not None:
            v = F.narray(vals)
            keep = v != 0
            rows, cols, v = rows[keep], cols[keep], v[keep]
        else:
            v = None
        if rows.size:
            n = max(n, int(rows.max()) + 1)
            m = max(m, int(cols.max()) + 1)
        return cls(n, m, F, rows.astype(np.int32), cols.astype(np.int32), v)

    @property
    def nz(self) -> int:
        return self.row.size

    def transpose_inplace(self):
        """O(1) transpose by swapping index arrays (spasm_triplet.c:26-34)."""
        self.row, self.col = self.col, self.row
        self.n, self.m = self.m, self.n

    def tocsr(self) -> "CSR":
        """COO -> CSR with duplicate summation mod p and zero removal."""
        n, m = self.n, self.m
        if self.nz == 0:
            return CSR.empty(n, m, self.field.p, self.val is not None)
        order = np.lexsort((self.col, self.row))
        r = self.row[order].astype(np.int64)
        c = self.col[order].astype(np.int64)
        if self.val is not None:
            # segment-sum duplicates (same (i,j)) modulo p
            key = r * m + c
            boundary = np.empty(key.size, dtype=bool)
            boundary[0] = True
            np.not_equal(key[1:], key[:-1], out=boundary[1:])
            seg = np.cumsum(boundary) - 1
            sums = np.zeros(int(seg[-1]) + 1, dtype=np.int64)
            np.add.at(sums, seg, self.val[order].astype(np.int64))
            v = self.field.narray(sums)
            r, c = r[boundary], c[boundary]
            keep = v != 0
            r, c, v = r[keep], c[keep], v[keep]
        else:
            # pattern: just drop duplicates
            key = r * m + c
            boundary = np.empty(key.size, dtype=bool)
            boundary[0] = True
            np.not_equal(key[1:], key[:-1], out=boundary[1:])
            r, c = r[boundary], c[boundary]
            v = None
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr, r + 1, 1)
        np.cumsum(indptr, out=indptr)
        return CSR(n, m, self.field, indptr, c.astype(np.int32), v)


@dataclasses.dataclass
class CSR:
    """Compressed-sparse-row matrix over GF(p)."""
    n: int
    m: int
    field: Field
    indptr: np.ndarray              # int64, size n+1
    indices: np.ndarray             # int32
    data: Optional[np.ndarray]      # int32 balanced, or None

    # ---- constructors ----------------------------------------------------

    @classmethod
    def empty(cls, n: int, m: int, prime: int, with_values: bool = True):
        return cls(n, m, Field(prime), np.zeros(n + 1, np.int64),
                   np.empty(0, np.int32),
                   np.empty(0, np.int32) if with_values else None)

    @classmethod
    def from_dense(cls, D, prime: int):
        F = Field(prime)
        D = F.narray(D)
        n, m = D.shape
        rows, cols = np.nonzero(D)
        indptr = np.zeros(n + 1, np.int64)
        np.add.at(indptr, rows + 1, 1)
        np.cumsum(indptr, out=indptr)
        return cls(n, m, F, indptr, cols.astype(np.int32),
                   D[rows, cols].astype(np.int32))

    @classmethod
    def from_rows(cls, n: int, m: int, prime: int, row_lists):
        """Build from a list of (cols_array, vals_array) per row."""
        lens = np.fromiter((len(c) for c, _ in row_lists), np.int64,
                           count=len(row_lists))
        indptr = np.zeros(n + 1, np.int64)
        indptr[1:1 + len(row_lists)] = np.cumsum(lens)
        if len(row_lists) < n:
            indptr[1 + len(row_lists):] = indptr[len(row_lists)]
        if row_lists:
            indices = np.concatenate([np.asarray(c, np.int32)
                                      for c, _ in row_lists])
            data = np.concatenate([np.asarray(v, np.int32)
                                   for _, v in row_lists])
        else:
            indices = np.empty(0, np.int32)
            data = np.empty(0, np.int32)
        return cls(n, m, Field(prime), indptr, indices, data)

    # ---- basics ----------------------------------------------------------

    @property
    def nnz(self) -> int:
        return int(self.indptr[self.n])

    @property
    def prime(self) -> int:
        return self.field.p

    def row_weight(self, i: int) -> int:
        return int(self.indptr[i + 1] - self.indptr[i])

    def row_weights(self) -> np.ndarray:
        return np.diff(self.indptr)

    def row(self, i: int):
        """(cols, vals) view of row i."""
        a, b = self.indptr[i], self.indptr[i + 1]
        return (self.indices[a:b],
                self.data[a:b] if self.data is not None else None)

    def row_ids(self) -> np.ndarray:
        """Row index of every stored entry (int32, size nnz)."""
        return np.repeat(np.arange(self.n, dtype=np.int32),
                         np.diff(self.indptr).astype(np.int64))

    def todense(self) -> np.ndarray:
        D = np.zeros((self.n, self.m), dtype=np.int32)
        rows = self.row_ids()
        if self.data is not None:
            # duplicates within a row must sum (mod p)
            acc = np.zeros((self.n, self.m), dtype=np.int64)
            np.add.at(acc, (rows, self.indices), self.data.astype(np.int64))
            D = self.field.narray(acc)
        else:
            D[rows, self.indices] = 1
        return D

    def copy(self) -> "CSR":
        return CSR(self.n, self.m, self.field, self.indptr.copy(),
                   self.indices.copy(),
                   None if self.data is None else self.data.copy())

    # ---- structural ops --------------------------------------------------

    def transpose(self, keep_values: bool = True) -> "CSR":
        """CSR transpose by stable counting-sort dispatch."""
        rows = self.row_ids()
        order = np.argsort(self.indices[:self.nnz], kind="stable")
        tindptr = np.zeros(self.m + 1, np.int64)
        np.add.at(tindptr, self.indices[:self.nnz].astype(np.int64) + 1, 1)
        np.cumsum(tindptr, out=tindptr)
        tindices = rows[order]
        tdata = None
        if keep_values and self.data is not None:
            tdata = self.data[:self.nnz][order].copy()
        return CSR(self.m, self.n, self.field, tindptr,
                   tindices.astype(np.int32), tdata)

    def permute(self, p=None, qinv=None, with_values: bool = True) -> "CSR":
        """C = P.A.Q^-1: row i of C is row p[i] of A; column j of A becomes
        column qinv[j] of C (spasm_permutation.c:68-103)."""
        n, m = self.n, self.m
        p = np.arange(n) if p is None else np.asarray(p, np.int64)
        starts = self.indptr[p]
        lens = (self.indptr[p + 1] - starts).astype(np.int64)
        indptr = np.zeros(n + 1, np.int64)
        indptr[1:] = np.cumsum(lens)
        # gather the entries of the permuted rows
        gather = _concat_ranges(starts, lens)
        indices = self.indices[gather]
        if qinv is not None:
            indices = np.asarray(qinv, np.int32)[indices]
        data = None
        if with_values and self.data is not None:
            data = self.data[gather].copy()
        return CSR(n, m, self.field, indptr, indices.astype(np.int32), data)

    def submatrix(self, r0: int, r1: int, c0: int, c1: int,
                  with_values: bool = True) -> "CSR":
        """A[r0:r1, c0:c1] (spasm_submatrix.c:7-43)."""
        r0, r1 = max(r0, 0), max(r1, r0)
        starts = self.indptr[r0:r1]
        lens = (self.indptr[r0 + 1:r1 + 1] - starts).astype(np.int64)
        gather = _concat_ranges(starts, lens)
        cols = self.indices[gather]
        keep = (cols >= c0) & (cols < c1)
        rows = np.repeat(np.arange(r1 - r0, dtype=np.int64), lens)[keep]
        indptr = np.zeros(r1 - r0 + 1, np.int64)
        np.add.at(indptr, rows + 1, 1)
        np.cumsum(indptr, out=indptr)
        data = None
        if with_values and self.data is not None:
            data = self.data[gather][keep].copy()
        return CSR(r1 - r0, max(c1 - c0, 0), self.field, indptr,
                   (cols[keep] - c0).astype(np.int32), data)

    def resize(self, n: int, m: int):
        """Change logical dimensions (new rows are empty)."""
        if n + 1 != self.indptr.size:
            new = np.empty(n + 1, np.int64)
            k = min(n + 1, self.indptr.size)
            new[:k] = self.indptr[:k]
            if n + 1 > self.indptr.size:
                new[k:] = self.indptr[-1]
            self.indptr = new
        self.n = n
        self.m = m

    def sort_rows(self) -> "CSR":
        """Return a copy with entries sorted by column within each row."""
        rows = self.row_ids().astype(np.int64)
        order = np.lexsort((self.indices[:self.nnz], rows))
        data = None if self.data is None else self.data[:self.nnz][order]
        return CSR(self.n, self.m, self.field, self.indptr.copy(),
                   self.indices[:self.nnz][order].copy(), data)


def _concat_ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized concatenation of ranges [starts[k], starts[k]+lens[k])."""
    starts = np.asarray(starts, np.int64)
    lens = np.asarray(lens, np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    which = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
    offsets = np.cumsum(lens) - lens           # start of each range in output
    pos = np.arange(total, dtype=np.int64) - offsets[which]
    return starts[which] + pos


def pinv(p: Optional[np.ndarray], n: int) -> Optional[np.ndarray]:
    """Inverse permutation (spasm_permutation.c:49-61); None = identity."""
    if p is None:
        return None
    p = np.asarray(p, np.int64)
    out = np.empty(n, np.int64)
    out[p] = np.arange(n, dtype=np.int64)
    return out


def random_permutation(n: int, rng=None) -> np.ndarray:
    rng = np.random.default_rng() if rng is None else rng
    return rng.permutation(n).astype(np.int64)
