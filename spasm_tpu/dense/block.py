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


class _Run(NamedTuple):
    """A stack of same-shape composed chunks, applied in order.

    Keeping chunks pre-stacked on device means eliminate() issues ONE
    scan dispatch per run instead of re-stacking host-side every call.
    """
    cols: jnp.ndarray       # (g, Cp) global column ids (padded -> m)
    jpos: jnp.ndarray       # (g, Kp) pivot-column positions inside cols
    V: jnp.ndarray          # (g, Kp, Cp) composed elimination rows
    k: int                  # total real pivot rows across the run


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


@functools.partial(jax.jit, static_argnames=("d", "kp", "cp"))
def _compose_chunk_batch_entries(rowrep, posidx, vals, jpos, p, weights,
                                 d: int, kp: int, cp: int):
    """Sparse-input chunk composition: scatter the chunk rows' entries
    into the densified (g, kp, cp) chunk ON DEVICE, then compose.

    Only the nnz of the chunk crosses host->device (the tunnel's H2D
    bandwidth is the scarcest resource), not the kp*cp dense block.
    Padded entries carry value 0 at a dead slot (scatter-add is inert).
    W is gathered on device: W[l, t] = Ud[l, jpos[t]] strictly above the
    diagonal (the intra-chunk corrections; pivots are unit by
    convention).
    """
    g = rowrep.shape[0]
    gi = jnp.arange(g)[:, None]
    Ud = jnp.zeros((g, kp, cp), jnp.int32)
    Ud = Ud.at[gi, rowrep, posidx].add(vals)
    idx = jnp.broadcast_to(jpos[:, None, :], (g, kp, kp))
    W = jnp.take_along_axis(Ud, idx, axis=2)          # (g, kp, kp)
    tri = jnp.triu(jnp.ones((kp, kp), bool), 1)
    W = jnp.where(tri[None], W, 0)

    def one(u, w):
        Winv = _unit_upper_inverse_log(w, p, weights, d)
        return matmul_digits(Winv, u, p, weights, d)

    return jax.vmap(one)(Ud, W)


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
        self.runs: List[_Run] = []
        self._dispatch: Optional[List[_Run]] = None
        self._dispatch_src = 0
        # staging area for rows not yet composed into a chunk
        self._stage: List[tuple] = []     # (cols, vals, pivcol)

    @property
    def nrows(self) -> int:
        return sum(r.k for r in self.runs) + len(self._stage)

    def append_rows(self, rows, flush: bool = True):
        """rows: iterable of (cols int64[], vals int32[], pivcol).

        Each row must have value 1 at its pivot column.
        """
        self._stage.extend(rows)
        if flush:
            self.flush()

    def flush(self):
        if not self._stage:
            return
        stage = self._stage
        self._stage = []
        # partition the stage into chunks respecting the dense budget
        batches = []
        i = 0
        while i < len(stage):
            take = min(len(stage) - i, self.chunk)
            while take > 1:
                u = np.unique(np.concatenate(
                    [stage[j][0] for j in range(i, i + take)])).size
                if take * u <= _DENSE_BUDGET:
                    break
                take //= 2
            batches.append(stage[i:i + take])
            i += take
        prepped = [self._prep_entries(b) for b in batches]
        # one vmapped composition dispatch per group of same-shape chunks
        # (order preserved: only consecutive chunks group together); only
        # sparse entries cross host->device, densification is on device
        j = 0
        while j < len(prepped):
            shape = (prepped[j][0].shape, len(prepped[j][3]),
                     len(prepped[j][4]))
            j2 = j
            while j2 < len(prepped) and (prepped[j2][0].shape,
                                         len(prepped[j2][3]),
                                         len(prepped[j2][4])) == shape:
                j2 += 1
            group = prepped[j:j2]
            rowrep = jnp.asarray(np.stack([g[0] for g in group]))
            posidx = jnp.asarray(np.stack([g[1] for g in group]))
            vals = jnp.asarray(np.stack([g[2] for g in group]))
            jpos = jnp.asarray(np.stack([g[3] for g in group]))
            kp = group[0][3].size
            cp = group[0][4].size
            V = _compose_chunk_batch_entries(
                rowrep, posidx, vals, jpos, jnp.int64(self.p),
                jnp.asarray(self.F.weights), self.F.ndigits, kp, cp)
            cols = jnp.asarray(np.stack([g[4] for g in group]))
            nreal = sum(g[5] for g in group)
            self.runs.append(_Run(cols, jpos, V, nreal))
            j = j2

    def _prep_entries(self, batch):
        """Host prep of one chunk: union support + flat sparse entries,
        padded to buckets.  Returns (rowrep (Ep,), posidx (Ep,),
        vals (Ep,), jp (Kp,), colsp (Cp,), K).  Densification happens on
        device (_compose_chunk_batch_entries)."""
        K = len(batch)
        union = np.unique(np.concatenate([c for c, _, _ in batch]))
        pivcols = np.asarray([pc for _, _, pc in batch], np.int64)
        Kp = _bucket(K)
        # always leave at least one padded (dead) column so padded pivot
        # slots never clamp onto a real column
        Cp = _bucket(union.size + 1)
        lens = np.asarray([c.size for c, _, _ in batch], np.int64)
        E = int(lens.sum())
        Ep = _bucket(E)
        rowrep = np.zeros(Ep, np.int32)
        posidx = np.full(Ep, Cp - 1, np.int32)      # dead slot for padding
        vals = np.zeros(Ep, np.int32)
        rowrep[:E] = np.repeat(np.arange(K, dtype=np.int32), lens)
        posidx[:E] = np.searchsorted(
            union, np.concatenate([c for c, _, _ in batch])).astype(np.int32)
        vals[:E] = np.concatenate([v for _, v, _ in batch]).astype(np.int32)
        jpos = np.searchsorted(union, pivcols)
        # padded pivot slots point at padded (zero) columns
        jp = np.full(Kp, 0, np.int64)
        jp[:K] = jpos
        if Kp > K:
            jp[K:] = union.size + np.arange(Kp - K) % (Cp - union.size)
        colsp = np.full(Cp, self.m, np.int64)     # padded cols -> dead col m
        colsp[:union.size] = union
        return rowrep, posidx, vals, jp, colsp, K

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
        Cp = _bucket(C + 1)      # at least one dead column (see _prep)
        if (Kp, Cp) != (K, C):
            V = jnp.pad(V, ((0, Kp - K), (0, Cp - C)))
        jp = np.full(Kp, 0, np.int64)
        jp[:K] = np.asarray(jpos, np.int64)
        if Kp > K:
            jp[K:] = C + np.arange(Kp - K) % (Cp - C)
        colsp = np.full(Cp, self.m, np.int64)
        colsp[:C] = np.asarray(cols, np.int64)
        self.runs.append(_Run(jnp.asarray(colsp)[None], jnp.asarray(jp)[None],
                              V[None], K))

    def pad_block(self, X: np.ndarray):
        """Host block (B, m) -> padded device array (row/col buckets;
        the extra dead column absorbs padded-slot writes).  Under an
        active mesh the block is placed row-sharded (pure DP)."""
        from .elim import _size_bucket
        from ..parallel.context import shard_rows
        B, m = X.shape
        Bp = _size_bucket(B, 8)
        mp = _size_bucket(m + 1, 64)
        Xp = np.zeros((Bp, mp), np.int32)
        Xp[:B, :m] = X
        return shard_rows(jnp.asarray(Xp))

    def _dispatch_runs(self) -> List[_Run]:
        """Merge consecutive same-shape runs and pad each run's chunk
        count to a power of two with dead (skipped) chunks, so the number
        of distinct _apply_chunk_run compilations stays bounded.  Cached
        until the run list changes.  Under an active mesh the chunk
        bases are placed replicated (DP: sharded rows x replicated U)."""
        from ..parallel.context import current_mesh, replicated
        mesh = current_mesh()
        key = (len(self.runs), None if mesh is None else id(mesh))
        if getattr(self, "_dispatch", None) is not None and \
                self._dispatch_src == key:
            return self._dispatch
        merged: List[_Run] = []
        for run in self.runs:
            if merged and merged[-1].V.shape[1:] == run.V.shape[1:]:
                prev = merged[-1]
                merged[-1] = _Run(
                    jnp.concatenate([prev.cols, run.cols]),
                    jnp.concatenate([prev.jpos, run.jpos]),
                    jnp.concatenate([prev.V, run.V]), prev.k + run.k)
            else:
                merged.append(run)
        out: List[_Run] = []
        for run in merged:
            g, Kp, Cp = run.V.shape
            gp = 1
            while gp < g:
                gp <<= 1
            if gp > g:
                # dead chunks: all-dead columns -> zero coefficient block
                # -> lax.cond skips them
                dcols = jnp.full((gp - g, Cp), self.m, jnp.int64)
                djpos = jnp.zeros((gp - g, Kp), jnp.int64)
                dV = jnp.zeros((gp - g, Kp, Cp), jnp.int32)
                run = _Run(jnp.concatenate([run.cols, dcols]),
                           jnp.concatenate([run.jpos, djpos]),
                           jnp.concatenate([run.V, dV]), run.k)
            if mesh is not None:
                run = _Run(replicated(run.cols, mesh),
                           replicated(run.jpos, mesh),
                           replicated(run.V, mesh), run.k)
            out.append(run)
        self._dispatch = out
        self._dispatch_src = key
        return out

    def eliminate_device(self, Xd):
        """Device-resident eliminate: Xd (Bp, mp) padded int32 on device;
        returns the updated device array (no host transfers)."""
        self.flush()
        if not self.runs:
            return Xd
        p64 = jnp.int64(self.p)
        w = jnp.asarray(self.F.weights)
        for run in self._dispatch_runs():
            if run.V.shape[0] == 1:
                Xd = _apply_chunk(Xd, run.cols[0], run.jpos[0], run.V[0],
                                  p64, w, self.F.ndigits)
            else:
                Xd = _apply_chunk_run(Xd, run.cols, run.jpos, run.V, p64,
                                      w, self.F.ndigits)
        return Xd

    def eliminate(self, X: np.ndarray) -> np.ndarray:
        """Eliminate dense block X (B, m) against all registered U rows.

        Returns X with elimination coefficients on pivotal columns and the
        Schur residue elsewhere (same convention as the scalar
        sparse_triangular_solve).
        """
        self.flush()
        if not self.runs:
            return X
        B = X.shape[0]
        Xd = self.eliminate_device(self.pad_block(X))
        return np.asarray(Xd)[:B, :self.m]
