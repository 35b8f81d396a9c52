"""Batched elimination of dense row blocks against a sparse pivot basis U.

This is the TPU-native replacement for the reference's per-row sparse
triangular solves (spasm_sparse_triangular_solve called row-by-row under
OpenMP, /root/reference/src/spasm_schur.c:86-193): instead of a DFS and a
scalar scatter chain per row, a whole *block* X of B dense rows is
eliminated against U with MXU matmuls.

Key ideas:
  * U's rows, in the order the engine created them, already form a valid
    sequential elimination order (within a pivot round they are
    topologically sorted; later rounds never touch earlier pivot columns).
  * consecutive U rows are grouped into *chunks*.  The effect of a chunk
    on X is composed exactly:
        alpha = X[:, J] @ (I + W)^-1        (B x K coefficients)
        X     = X - alpha @ U_chunk         (mod p)
    where J are the chunk's pivot columns and W[l, k] = U[l, j_k]
    (strictly upper, the intra-chunk corrections).  V = (I+W)^-1 @ U_chunk
    is precomputed once per chunk and reused for every block.
  * chunks are column-compacted: U_chunk is densified only on the union
    support C of its rows, so memory tracks nnz(U_chunk), not m.
  * after the update, alpha is written back into X[:, J], matching the
    convention of the scalar solver (coefficients on pivotal columns,
    Schur residue on the rest).
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .modp import device_field, dnorm, dnorm64, matmul_digits, mulmod

_DEFAULT_CHUNK = 256
_DENSE_BUDGET = 32 << 20      # max int32 elements per densified chunk


class _Chunk(NamedTuple):
    cols: np.ndarray        # (|C|,) global column ids (union support)
    jpos: np.ndarray        # (K,) positions of pivot columns inside cols
    V: jnp.ndarray          # (K, |C|) composed elimination rows (device)


def _unit_upper_inverse_log(W, p, weights, d: int):
    """(I + W)^-1 for strictly upper-triangular W mod p, by log-squaring.

    W nilpotent (W^K = 0), so (I+W)^-1 = sum_i (-W)^i; the partial sums
    satisfy S_{2j} = S_j (I + (-W)^j), giving ceil(log2 K) rounds of two
    MXU matmuls instead of a K-step sequential loop — the loop was the
    latency bottleneck of chunk composition on TPU.
    """
    k = W.shape[0]
    eye = jnp.eye(k, dtype=jnp.int32)
    N = dnorm(-W.astype(jnp.int64), p)
    S = dnorm(eye.astype(jnp.int64) + N.astype(jnp.int64), p)
    P = matmul_digits(N, N, p, weights, d)
    rounds = max(int(np.ceil(np.log2(max(k, 2)))), 1)
    for _ in range(rounds):
        S = dnorm(S.astype(jnp.int64)
                  + matmul_digits(S, P, p, weights, d).astype(jnp.int64), p)
        P = matmul_digits(P, P, p, weights, d)
    return S


@functools.partial(jax.jit, static_argnames=("d",))
def _compose_chunk(Udense, W, p, weights, d: int):
    """V = (I + W)^-1 @ Udense (mod p)."""
    Winv = _unit_upper_inverse_log(W.astype(jnp.int32), p, weights, d)
    return matmul_digits(Winv, Udense, p, weights, d)


@functools.partial(jax.jit, static_argnames=("d",))
def _apply_chunk(X, cols, jpos, V, p, weights, d: int):
    """One chunk update on a dense block X (B, m)."""
    Xc = X[:, cols]                                   # (B, |C|)
    F = Xc[:, jpos]                                   # (B, K) current coeffs
    delta = matmul_digits(F, V, p, weights, d)        # (B, |C|)
    Xc = dnorm(Xc.astype(jnp.int64) - delta.astype(jnp.int64), p)
    Xc = Xc.at[:, jpos].set(F)      # park coefficients on pivot columns
    return X.at[:, cols].set(Xc)


@functools.partial(jax.jit, static_argnames=("d",))
def _apply_chunk_run(X, cols, jpos, V, p, weights, d: int):
    """Apply a run of same-bucket chunks sequentially in ONE dispatch.

    cols: (nc, Cp), jpos: (nc, Kp), V: (nc, Kp, Cp).  A chunk whose
    coefficient block is all zero is skipped (lax.cond), which makes
    re-elimination against already-cleared history chunks nearly free.
    """
    def body(X, ch):
        c, j, v = ch
        Xc = X[:, c]
        F = Xc[:, j]

        def live(X):
            delta = matmul_digits(F, v, p, weights, d)
            Xc2 = dnorm(Xc.astype(jnp.int64) - delta.astype(jnp.int64), p)
            Xc2 = Xc2.at[:, j].set(F)
            return X.at[:, c].set(Xc2)

        X = jax.lax.cond(jnp.any(F != 0), live, lambda X: X, X)
        return X, None

    X, _ = jax.lax.scan(body, X, (cols, jpos, V))
    return X


def _pad_to(x: np.ndarray, size: int, fill=0) -> np.ndarray:
    if x.shape[-1] == size:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, size - x.shape[-1])]
    return np.pad(x, pad, constant_values=fill)


def _bucket(k: int) -> int:
    """Round up to a power of two (min 32) to bound jit variants."""
    b = 32
    while b < k:
        b <<= 1
    return b


class UEliminator:
    """Incrementally built chunked eliminator for a growing pivot basis U.

    append_rows() registers new U rows (in engine order); eliminate()
    applies the full composed elimination to a dense block.
    """

    def __init__(self, m: int, p: int, chunk: int = _DEFAULT_CHUNK):
        self.m = m
        self.p = p
        self.F = device_field(p)
        self.chunk = chunk
        self.chunks: List[_Chunk] = []
        # staging area for rows not yet composed into a chunk
        self._stage: List[tuple] = []     # (cols, vals, pivcol)

    @property
    def nrows(self) -> int:
        return sum(c.jpos.size for c in self.chunks) + len(self._stage)

    def append_rows(self, rows, flush: bool = True):
        """rows: iterable of (cols int64[], vals int32[], pivcol).

        Each row must have value 1 at its pivot column.
        """
        self._stage.extend(rows)
        if flush:
            self.flush()

    def flush(self):
        while self._stage:
            take = len(self._stage)
            # shrink chunk so the densified size respects the budget
            while take > 1:
                cols_union = set()
                tot = 0
                for c, _, _ in self._stage[:take]:
                    cols_union.update(c.tolist())
                if take * len(cols_union) <= _DENSE_BUDGET and \
                        take <= self.chunk:
                    break
                take //= 2
            batch = self._stage[:take]
            self._stage = self._stage[take:]
            self._compose(batch)

    def _compose(self, batch):
        K = len(batch)
        union = np.unique(np.concatenate([c for c, _, _ in batch]))
        pivcols = np.asarray([pc for _, _, pc in batch], np.int64)
        # dense chunk on the union support
        Ud = np.zeros((K, union.size), np.int32)
        for k, (c, v, _) in enumerate(batch):
            Ud[k, np.searchsorted(union, c)] = v
        jpos = np.searchsorted(union, pivcols)
        # W[l, k] = U[l, j_k] for l < k (strictly upper)
        W = Ud[:, jpos].astype(np.int32)
        W = np.triu(W, 1)
        # pad to buckets for jit reuse
        Kp = _bucket(K)
        Cp = _bucket(union.size)
        Ud = _pad_to(np.pad(Ud, ((0, Kp - K), (0, 0))), Cp)
        Wp = np.zeros((Kp, Kp), np.int32)
        Wp[:K, :K] = W
        # padded pivot slots point at padded (zero) columns: position
        # beyond union.size, each slot a distinct dead column
        jp = np.full(Kp, 0, np.int64)
        jp[:K] = jpos
        if Kp > K:
            dead = union.size + np.arange(Kp - K) % max(Cp - union.size, 1)
            jp[K:] = dead
        V = _compose_chunk(jnp.asarray(Ud), jnp.asarray(Wp),
                           jnp.int64(self.p), jnp.asarray(self.F.weights),
                           self.F.ndigits)
        colsp = np.full(Cp, self.m, np.int64)     # padded cols -> dead col m
        colsp[:union.size] = union
        self.chunks.append(_Chunk(colsp, jp, V))

    def append_device_chunk(self, V, cols: np.ndarray, jpos: np.ndarray):
        """Register an already-composed chunk resident on device.

        V: (K, C) int32 device array of mutually reduced rows (value 1 at
        the pivot slots — e.g. the pivot rows of a device RREF, whose
        intra-chunk corrections are zero by construction, so V needs no
        (I+W)^-1 composition).  cols: (C,) global column ids (host);
        jpos: (K,) positions of the pivot columns inside cols (host).
        No host<->device transfer of V takes place.
        """
        self.flush()        # keep engine ordering: staged rows first
        K, C = V.shape
        Kp = _bucket(K)
        Cp = _bucket(C)
        if (Kp, Cp) != (K, C):
            V = jnp.pad(V, ((0, Kp - K), (0, Cp - C)))
        jp = np.full(Kp, 0, np.int64)
        jp[:K] = np.asarray(jpos, np.int64)
        if Kp > K:
            dead = C + np.arange(Kp - K) % max(Cp - C, 1)
            jp[K:] = dead
        colsp = np.full(Cp, self.m, np.int64)
        colsp[:C] = np.asarray(cols, np.int64)
        self.chunks.append(_Chunk(colsp, jp, V))

    def pad_block(self, X: np.ndarray):
        """Host block (B, m) -> padded device array (row/col buckets;
        the extra dead column absorbs padded-slot writes)."""
        from .elim import _size_bucket
        B, m = X.shape
        Bp = _size_bucket(B, 8)
        mp = _size_bucket(m + 1, 64)
        Xp = np.zeros((Bp, mp), np.int32)
        Xp[:B, :m] = X
        return jnp.asarray(Xp)

    def eliminate_device(self, Xd):
        """Device-resident eliminate: Xd (Bp, mp) padded int32 on device;
        returns the updated device array (no host transfers)."""
        self.flush()
        if not self.chunks:
            return Xd
        p64 = jnp.int64(self.p)
        w = jnp.asarray(self.F.weights)
        # fuse consecutive same-bucket chunks into single scan dispatches
        k = 0
        nchunks = len(self.chunks)
        while k < nchunks:
            shape = self.chunks[k].V.shape
            k2 = k
            while k2 < nchunks and self.chunks[k2].V.shape == shape:
                k2 += 1
            run = self.chunks[k:k2]
            if len(run) == 1:
                ch = run[0]
                Xd = _apply_chunk(Xd, jnp.asarray(ch.cols),
                                  jnp.asarray(ch.jpos), ch.V, p64, w,
                                  self.F.ndigits)
            else:
                cols = jnp.asarray(np.stack([c.cols for c in run]))
                jpos = jnp.asarray(np.stack([c.jpos for c in run]))
                V = jnp.stack([c.V for c in run])
                Xd = _apply_chunk_run(Xd, cols, jpos, V, p64, w,
                                      self.F.ndigits)
            k = k2
        return Xd

    def eliminate(self, X: np.ndarray) -> np.ndarray:
        """Eliminate dense block X (B, m) against all registered U rows.

        Returns X with elimination coefficients on pivotal columns and the
        Schur residue elsewhere (same convention as the scalar
        sparse_triangular_solve).
        """
        self.flush()
        if not self.chunks:
            return X
        B = X.shape[0]
        Xd = self.eliminate_device(self.pad_block(X))
        return np.asarray(Xd)[:B, :self.m]
