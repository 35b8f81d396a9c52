"""The echelonization engine: round-structured structural pivoting + Schur
complements + dense finishers.

The capability equivalent of /root/reference/src/spasm_echelonize.c, with
the execution model inverted for TPUs (SURVEY.md §7): structural pivot
rounds run as host graph passes; all arithmetic-heavy elimination flows
through the chunked device eliminator and the blocked device RREF/PLUQ
(spasm_tpu.dense), with the per-row Gilbert-Peierls solver kept as the
sparse finisher of last resort.

Round loop (defaults mirror spasm_echelonize_init_opts,
spasm_echelonize.c:9-28): find structural pivots -> stop if too few
(min_pivot_proportion) or the Schur complement is too dense
(sparsity_threshold) or max_round reached -> else compute the sparse Schur
complement and iterate on it.  TPU-first extension: as soon as the
free-column count fits a dense device block (device_dense_width), the
round loop stops and the DEVICE-RESIDENT finisher takes over — one
upload of the matrix entries, then combination forming, chunked
elimination, compaction and row-sweep RREF entirely on device, with
only pivot-column maps crossing back.  Classic finalization (aspect
ratio > tall_and_skinny_ratio -> randomized low-rank; density >
threshold -> blocked dense; else GPLU) remains for L-mode, huge widths
and no-device runs.
"""
from __future__ import annotations

import dataclasses
import logging
import sys
import time
from typing import List, Optional

import numpy as np

from .csr import CSR
from .field import Field
from .pivots import find_structural_pivots
from .schur import (estimate_density, schur_sparse, schur_dense_block,
                    schur_dense_randomized)
from .triangular import sparse_triangular_solve
from .dense.elim import dense_rref, dense_lu, dense_rank
from .dense.block import UEliminator
from . import checkpoint as ckpt
from .profiling import phase, annotate

log = logging.getLogger("spasm_tpu")
if not log.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("%(message)s"))
    log.addHandler(_h)
    log.setLevel(logging.INFO)


@dataclasses.dataclass
class EchelonizeOptions:
    """Mirror of struct echelonize_opts (spasm.h:84-108) with the
    reference defaults (spasm_echelonize.c:9-28)."""
    enable_greedy_pivot_search: bool = True
    enable_tall_and_skinny: bool = True
    enable_dense: bool = True
    enable_GPLU: bool = True
    L: bool = False
    complete: bool = False
    min_pivot_proportion: float = 0.1
    max_round: int = 3
    sparsity_threshold: float = 0.05
    tall_and_skinny_ratio: float = 5.0
    dense_block_size: int = 1000
    low_rank_ratio: float = 0.5
    low_rank_start_weight: int = -1
    # TPU-build extension (not in the reference): BFS expansion budget for
    # the greedy pivot search; -1 = auto (32 * nnz), 0 = unlimited.
    greedy_work_budget: int = -1
    # TPU-build extension: the device-resident dense finisher takes over
    # as soon as the number of free (non-pivotal) columns fits this
    # width — the remaining rank lives in a dense block that belongs on
    # the MXU, so further sparse Schur rounds are skipped (SURVEY.md §7
    # "invert the reference's emphasis").  0 disables (reference-shaped
    # round loop + host/hybrid finishers).
    device_dense_width: int = 32768
    # Minimum remaining work (rows * free columns) before the device
    # finisher pays for its dispatches; below it the host paths win.
    device_dense_min: int = 1 << 22
    # HBM budget (bytes) for the finisher's accumulated basis
    # (~ free_cols * remaining_rank * itemsize); widths whose basis
    # would exceed it fall back to the sparse-round / host finishers.
    device_dense_mem: int = 5 << 30
    # TPU-build extension: mid-engine checkpoint/resume (SURVEY.md §5.4).
    # When set, the engine snapshots its state to this file after every
    # round and every dense-finisher block; re-running with the same input
    # resumes from the snapshot.  The file is removed on completion.
    checkpoint_file: Optional[str] = None
    # Minimum seconds between dense-finisher snapshots (each save repacks
    # U + S, O(nnz); unthrottled per-block saves can dominate the
    # finisher).  Round-boundary snapshots are never throttled.
    checkpoint_interval_s: float = 30.0


class _LBuilder:
    """Triplet accumulator for L (the reference's Ltmp)."""

    def __init__(self, prime: int):
        self.prime = prime
        self.rows: List[np.ndarray] = []
        self.cols: List[np.ndarray] = []
        self.vals: List[np.ndarray] = []

    def add(self, i: int, j: int, x: int):
        self.add_batch(np.asarray([i], np.int64), np.asarray([j], np.int64),
                       np.asarray([x], np.int64))

    def add_batch(self, i, j, x):
        self.rows.append(np.asarray(i, np.int64))
        self.cols.append(np.asarray(j, np.int64))
        self.vals.append(np.asarray(x, np.int64))

    def truncate(self) -> int:
        return len(self.rows)

    def rollback_filter(self, mark: int, keep_row) -> None:
        """Drop entries added after `mark` whose row fails keep_row."""
        for k in range(mark, len(self.rows)):
            sel = keep_row(self.rows[k])
            self.rows[k] = self.rows[k][sel]
            self.cols[k] = self.cols[k][sel]
            self.vals[k] = self.vals[k][sel]

    def build(self, n: int, ncols: int) -> CSR:
        from .csr import COO
        if self.rows:
            r = np.concatenate(self.rows)
            c = np.concatenate(self.cols)
            v = np.concatenate(self.vals)
        else:
            r = c = v = np.empty(0, np.int64)
        T = COO.from_entries(n, max(ncols, 1), self.prime, r, c, v)
        T.n, T.m = n, max(ncols, 1)
        A = T.tocsr()
        A.resize(n, ncols)
        return A


class _UBuilder:
    """Incremental U accumulator: rows with unitary pivots first.

    Rows may arrive as host (cols, vals) pairs or as *device-resident
    dense blocks* (the pivot rows of a device RREF); the latter are
    materialized to host sparse rows lazily, so the engine's hot path
    never waits on a matrix-sized device->host transfer.
    """

    def __init__(self, m: int, prime: int):
        self.m = m
        self.prime = prime
        self.field = Field(prime)
        self.rows: List[tuple] = []      # (cols, vals), pivot first
        self.qinv = np.full(m, -1, dtype=np.int64)
        self.pivcol: List[int] = []
        # deferred device blocks: (Rd, colmap, pivcols_global, base_row)
        self._pending: List[tuple] = []

    @property
    def n(self) -> int:
        return len(self.rows)

    def add_row(self, pivcol: int, cols: np.ndarray, vals: np.ndarray):
        """cols/vals: full row with value 1 at pivcol; pivot stored first."""
        k = len(self.rows)
        sel = cols != pivcol
        c = np.concatenate(([pivcol], cols[sel])).astype(np.int32)
        v = np.concatenate(([1], vals[sel])).astype(np.int32)
        self.rows.append((c, v))
        self.qinv[pivcol] = k
        self.pivcol.append(int(pivcol))

    def add_dense_rows_device(self, Rd, colmap: np.ndarray,
                              pivcols_global: np.ndarray):
        """Register device RREF rows without transferring them.

        Rd: (rank, w) int32 device block (row k has value 1 at the column
        mapping to pivcols_global[k]); colmap: (w,) global column ids.
        """
        k0 = len(self.rows)
        for i, pc in enumerate(np.asarray(pivcols_global, np.int64)):
            self.qinv[pc] = k0 + i
            self.pivcol.append(int(pc))
            self.rows.append(None)
        self._pending.append((Rd, np.asarray(colmap, np.int64),
                              np.asarray(pivcols_global, np.int64), k0))

    def flush_device(self):
        """Materialize pending device blocks into host sparse rows."""
        for Rd, colmap, pivcols, k0 in self._pending:
            R = np.asarray(Rd)                     # the one D2H transfer
            nz_r, nz_c = np.nonzero(R)
            counts = np.bincount(nz_r, minlength=R.shape[0])
            offs = np.concatenate(([0], np.cumsum(counts)))
            vals_flat = R[nz_r, nz_c].astype(np.int32)
            cols_flat = colmap[nz_c]
            for i in range(R.shape[0]):
                sl = slice(offs[i], offs[i + 1])
                cols = cols_flat[sl]
                vals = vals_flat[sl]
                pc = pivcols[i]
                sel = cols != pc
                c = np.concatenate(([pc], cols[sel])).astype(np.int32)
                v = np.concatenate(([1], vals[sel])).astype(np.int32)
                self.rows[k0 + i] = (c, v)
        self._pending = []

    def snapshot_csr(self) -> CSR:
        self.flush_device()
        return CSR.from_rows(self.n, self.m, self.prime, self.rows)

    def nnz(self) -> int:
        if self._pending:
            return -1          # unknown without forcing a transfer
        return sum(c.size for c, _ in self.rows)


class _GrowingCSR:
    """Append-only CSR view with capacity doubling.

    The GPLU finisher solves each chunk against the *current* U; repacking
    U with CSR.from_rows per chunk costs O(nnz(U)) every time — quadratic
    over the run.  This buffer appends new rows in amortized O(row nnz)
    and exposes trimmed views compatible with the native solver.
    """

    def __init__(self, base: CSR):
        self.n = base.n
        self.m = base.m
        self.prime = base.prime
        nnz = base.nnz
        cap_r = max(2 * base.n + 8, 64)
        cap_e = max(2 * nnz + 64, 256)
        self._indptr = np.zeros(cap_r + 1, np.int64)
        self._indptr[:base.n + 1] = base.indptr[:base.n + 1]
        self._indices = np.empty(cap_e, np.int32)
        self._indices[:nnz] = base.indices[:nnz]
        self._data = np.empty(cap_e, np.int32)
        self._data[:nnz] = base.data[:nnz]
        self._nnz = nnz

    @property
    def indptr(self) -> np.ndarray:
        return self._indptr[:self.n + 1]

    @property
    def indices(self) -> np.ndarray:
        return self._indices[:self._nnz]

    @property
    def data(self) -> np.ndarray:
        return self._data[:self._nnz]

    def append_row(self, cols: np.ndarray, vals: np.ndarray):
        k = len(cols)
        if self._nnz + k > self._indices.size:
            cap = max(2 * self._indices.size, self._nnz + k)
            for name in ("_indices", "_data"):
                old = getattr(self, name)
                new = np.empty(cap, np.int32)
                new[:self._nnz] = old[:self._nnz]
                setattr(self, name, new)
        if self.n + 2 > self._indptr.size:
            new = np.zeros(2 * self._indptr.size, np.int64)
            new[:self.n + 1] = self._indptr[:self.n + 1]
            self._indptr = new
        self._indices[self._nnz:self._nnz + k] = cols
        self._data[self._nnz:self._nnz + k] = vals
        self._nnz += k
        self.n += 1
        self._indptr[self.n] = self._nnz


class LU:
    """Result object (the reference's struct spasm_lu, spasm.h:64-72).

    U may be deferred: when constructed with a thunk, the CSR is
    materialized from the device on first access, so rank-only flows
    (e.g. tools/rank) never pay the matrix-sized device->host transfer.
    """

    def __init__(self, r: int, U: Optional[CSR] = None,
                 qinv: Optional[np.ndarray] = None,
                 L: Optional[CSR] = None,
                 p: Optional[np.ndarray] = None, complete: bool = False,
                 u_thunk=None):
        self.r = r
        self._U = U
        self._u_thunk = u_thunk
        self.qinv = qinv        # (m,) pivot of col j on row qinv[j] of U
        self.L = L
        self.p = p              # (r,) original row of pivot k
        self.complete = complete

    @property
    def U(self) -> CSR:
        if self._U is None and self._u_thunk is not None:
            self._U = self._u_thunk()
            self._u_thunk = None
        return self._U

    @U.setter
    def U(self, value):
        self._U = value
        self._u_thunk = None


class _Engine:
    def __init__(self, A: CSR, opts: EchelonizeOptions):
        self.A0 = A
        self.opts = opts
        self.m = A.m
        self.prime = A.prime
        self.field = A.field
        self.U = _UBuilder(A.m, A.prime)
        self.L = _LBuilder(A.prime) if opts.L else None
        self.Lp: List[int] = []          # original pivot row per U row
        self.elim = UEliminator(A.m, A.prime)

    # -- U update helpers --------------------------------------------------

    def _push_u_row(self, pivcol: int, cols, vals):
        self.U.add_row(pivcol, np.asarray(cols), np.asarray(vals))
        cols_p, vals_p = self.U.rows[-1]
        self.elim.append_rows(
            [(cols_p.astype(np.int64), vals_p, int(pivcol))], flush=False)

    def extract_structural(self, S: CSR, p_in) -> tuple:
        """Find structural pivots in S, push them to U/L.
        Returns (npiv, p) with pivotal rows of S first in topo order.
        (reference: spasm_pivots_extract_structural, spasm_pivots.c:369-448)
        """
        t0 = time.time()
        with phase("pivots"):
            npiv, p, pinv, qinv_loc, levels = find_structural_pivots(
                S, self.opts.enable_greedy_pivot_search,
                self.opts.greedy_work_budget)
        F = self.field
        if npiv:
            # vectorized row extraction + batch normalization
            from .csr import _concat_ranges
            rows = p[:npiv]
            starts = S.indptr[rows]
            lens = (S.indptr[rows + 1] - starts).astype(np.int64)
            gather = _concat_ranges(starts, lens)
            cols_flat = S.indices[gather].astype(np.int64)
            vals_flat = S.data[gather].astype(np.int64)
            rowrep = np.repeat(np.arange(npiv), lens)
            pivcols = pinv[rows]
            on_piv = cols_flat == pivcols[rowrep]
            pv = np.zeros(npiv, np.int64)
            pv[rowrep[on_piv]] = vals_flat[on_piv]
            alpha = F.inverse_array(pv).astype(np.int64)
            scaled = F.narray(vals_flat * alpha[rowrep]).astype(np.int32)
            offs = np.concatenate(([0], np.cumsum(lens)))
            iorigs = (np.asarray(p_in, np.int64)[rows]
                      if p_in is not None else rows)
            if self.L is not None:
                self.L.add_batch(iorigs,
                                 self.U.n + np.arange(npiv), pv)
            self.Lp.extend(int(v) for v in iorigs)
            # pivot-first reordering, fully vectorized: swap the pivot
            # entry of each row with the row's first slot
            piv_pos = np.flatnonzero(on_piv)
            first = offs[:-1]
            cols2 = cols_flat.copy()
            vals2 = scaled.copy()
            cols2[piv_pos] = cols_flat[first]
            vals2[piv_pos] = scaled[first]
            cols2[first] = pivcols
            vals2[first] = 1
            cols32 = cols2.astype(np.int32)
            k0 = self.U.n
            stage = []
            for k in range(npiv):
                sl = slice(offs[k], offs[k + 1])
                c, v = cols32[sl], vals2[sl]
                self.U.rows.append((c, v))
                self.U.pivcol.append(int(pivcols[k]))
                stage.append((cols2[sl], v, int(pivcols[k])))
            self.U.qinv[pivcols] = k0 + np.arange(npiv)
            self.elim.append_rows(stage, flush=False, levels=levels)
        self.elim.flush()
        log.info("[pivots] %d structural pivots found [%.2fs]",
                 npiv, time.time() - t0)
        return npiv, p

    def update_after_rref(self, R: np.ndarray, pivcols: np.ndarray,
                          q: np.ndarray):
        """Push dense RREF rows (columns compacted by q) into U.
        (reference: update_U_after_rref, spasm_echelonize.c:192-223)"""
        nz_r, nz_c = np.nonzero(R)
        counts = np.bincount(nz_r, minlength=R.shape[0])
        offs = np.concatenate(([0], np.cumsum(counts)))
        vals_flat = R[nz_r, nz_c]
        cols_flat = q[nz_c]
        for k in range(len(pivcols)):
            sl = slice(offs[k], offs[k + 1])
            self._push_u_row(int(q[pivcols[k]]), cols_flat[sl],
                             vals_flat[sl])
        self.elim.flush()

    def update_after_lu(self, rank: int, prows, pivcols, Ld, Urows,
                        q: np.ndarray, p_out: np.ndarray, lmark: int):
        """Push dense LU into U and L.
        (reference: update_fact_after_LU, spasm_echelonize.c:228-313)"""
        if not self.opts.complete:
            pivotal = set(int(p_out[r]) for r in prows)
            self.L.rollback_filter(
                lmark, lambda rows: np.isin(rows,
                                            np.asarray(list(pivotal) or [-1])))
        ubase = self.U.n
        # L entries from the dense factor
        nrows = Ld.shape[0]
        rows_iter = range(nrows) if self.opts.complete else \
            [int(r) for r in prows]
        for i in rows_iter:
            iorig = int(p_out[i])
            nz = np.nonzero(Ld[i])[0]
            if nz.size:
                self.L.add_batch(np.full(nz.size, iorig, np.int64),
                                 ubase + nz, Ld[i][nz])
        for k in range(rank):
            self.Lp.append(int(p_out[prows[k]]))
            nz = np.nonzero(Urows[k])[0]
            self._push_u_row(int(q[pivcols[k]]), q[nz], Urows[k][nz])
        self.elim.flush()

    # -- completion test ---------------------------------------------------

    def test_completion(self, S: CSR, p: np.ndarray, n: int) -> bool:
        """Probabilistic early-abort test with ceil(128/log2 p) random
        combinations (spasm_echelonize.c:30-51)."""
        if n == 0 or S.nnz == 0:
            return True
        Sn = int(np.ceil(128 / np.log2(self.prime)))
        if self.elim.nrows > 0:
            # device-resident: only the (m,) pivot map returns to host
            from .dense.elim import dense_rref_device
            Xd, _ = schur_dense_randomized(S, p, n, None, self.U.qinv,
                                           Sn, 0, eliminator=self.elim,
                                           return_device=True)
            _, pivcols = dense_rref_device(Xd, self.prime)
            return len(pivcols) == 0
        U = self.U.snapshot_csr()
        X, _ = schur_dense_randomized(S, p, n, U, self.U.qinv, Sn, 0,
                                      eliminator=self.elim)
        return dense_rank(X, self.prime) == 0

    # -- finishers ---------------------------------------------------------

    @annotate("finish_lowrank")
    def finish_dense_lowrank(self, S: CSR, p: np.ndarray, n: int):
        """Randomized tall-and-skinny finisher
        (echelonize_dense_lowrank, spasm_echelonize.c:315-379)."""
        opts = self.opts
        Sm = self.m - self.U.n
        rank_ub = min(n, Sm)
        w = int(np.ceil(-np.log(0.01) * n / max(rank_ub, 1))) \
            if opts.low_rank_start_weight < 0 else opts.low_rank_start_weight
        t0 = time.time()
        old_un = self.U.n
        seed = 0
        rounds = 0
        use_device = self.elim.nrows > 0
        while True:
            Sn = min(rank_ub, opts.dense_block_size)
            if Sn <= 0:
                break
            if use_device:
                from .dense.elim import dense_rref_device
                Xd, q = schur_dense_randomized(
                    S, p, n, None, self.U.qinv, Sn, w,
                    eliminator=self.elim, seed_base=seed,
                    return_device=True)
                seed += Sn
                Rd, pivcols = dense_rref_device(Xd, self.prime)
                rr = len(pivcols)
                if rr:
                    self.elim.append_device_chunk(Rd, q, pivcols)
                    self.U.add_dense_rows_device(Rd, q, q[pivcols])
            else:
                U = self.U.snapshot_csr()
                X, q = schur_dense_randomized(S, p, n, U, self.U.qinv,
                                              Sn, w, eliminator=self.elim,
                                              seed_base=seed)
                seed += Sn
                R, pivcols = dense_rref(X, self.prime)
                rr = len(pivcols)
                if rr:
                    self.update_after_rref(R, pivcols, q)
            if rr == 0:
                if self.test_completion(S, p, n):
                    break
                log.info("[lowrank] failed termination test; full combos")
                w = 0
                continue
            if rr < 0.9 * Sn:
                w = max(2 * w, 2)
            use_device = self.elim.nrows > 0
            rank_ub -= rr
            rounds += 1
            log.info("[lowrank] round %d: %d new pivots", rounds, rr)
        log.info("[lowrank] done in %.1fs, %d new pivots",
                 time.time() - t0, self.U.n - old_un)

    @annotate("finish_dense")
    def finish_dense(self, S: CSR, p: np.ndarray, n: int, p_in,
                     checkpoint_cb=None, processed: int = 0):
        """Blocked dense finisher (echelonize_dense,
        spasm_echelonize.c:385-463)."""
        opts = self.opts
        t0 = time.time()
        old_un = self.U.n
        lowrank_mode = False
        # The reference caps blocks at dense_block_size (1000) for host
        # RAM; on TPU bigger blocks amortize dispatch and keep the MXU
        # busy, so scale up to an HBM element budget when possible.
        elem_budget = 64 << 20
        while True:
            nq = int(np.count_nonzero(self.U.qinv < 0))
            auto_bs = max(opts.dense_block_size,
                          elem_budget // max(nq, 1))
            Sn = min(auto_bs if not opts.L else opts.dense_block_size,
                     n - processed)
            if Sn <= 0:
                break
            rows = p[processed:processed + Sn]
            lmark = self.L.truncate() if self.L is not None else 0
            if opts.L:
                X, q, p_out = schur_dense_block(S, rows, p_in, self.U.qinv,
                                                self.elim, self.L,
                                                U_csr=self.U.snapshot_csr())
                rank, prows, pivcols, Ld, Urows = dense_lu(X, self.prime)
                self.update_after_lu(rank, prows, pivcols, Ld, Urows, q,
                                     p_out, lmark)
                rr = rank
            else:
                # device-resident: eliminate -> RREF -> register the pivot
                # rows as a device chunk; no matrix-sized D2H transfer
                from .dense.elim import dense_rref_device
                from .schur import schur_dense_block_device
                Xd, q, p_out = schur_dense_block_device(
                    S, rows, p_in, self.U.qinv, self.elim)
                Rd, pivcols = dense_rref_device(Xd, self.prime)
                rr = len(pivcols)
                if rr:
                    self.elim.append_device_chunk(Rd, q, pivcols)
                    self.U.add_dense_rows_device(Rd, q, q[pivcols])
            processed += Sn
            log.info("[dense] block of %d rows: %d new pivots", Sn, rr)
            if checkpoint_cb is not None:
                checkpoint_cb(processed)
            rank_ub = min(S.n - self.U.n, self.m - self.U.n)
            if opts.enable_tall_and_skinny and rr < opts.low_rank_ratio * Sn:
                lowrank_mode = True
                break
        if lowrank_mode and n - processed > 0:
            log.info("[dense] too few pivots; switching to low-rank mode")
            self.finish_dense_lowrank(S, p[processed:], n - processed)
        else:
            log.info("[dense] done in %.1fs, %d new pivots",
                     time.time() - t0, self.U.n - old_un)

    # -- device-resident finisher (TPU-first redesign) ---------------------

    def _completion_device(self, dcsr, cand_mask_d, qsel_d, basis,
                           seed: int) -> bool:
        """Probabilistic completion test, fully on device: random full
        combinations of the candidate rows, eliminated against the whole
        basis; complete iff every residue is zero.  One scalar crosses
        device->host.  (spasm_echelonize.c:30-51 with the combination
        formed by a device SpMV instead of a host scatter loop.)"""
        import jax
        import jax.numpy as jnp
        Sn = int(np.ceil(128 / np.log2(self.prime)))
        key = jax.random.PRNGKey(seed)
        XT = jax.random.randint(key, (Sn, dcsr.n), 0, self.prime,
                                dtype=jnp.int32)
        XT = jnp.where(cand_mask_d[None, :], XT, 0)
        Y = dcsr.spmv(XT)
        from .dense.elim import _size_bucket
        Bp = _size_bucket(Sn, 8)
        if Bp > Sn:
            Y = jnp.pad(Y, ((0, Bp - Sn), (0, 0)))
        Y = self.elim.eliminate_device(Y)
        Yq = basis.apply(Y[:, qsel_d])
        return not bool(np.asarray(jnp.any(Yq != 0)))

    @annotate("finish_device")
    def finish_device_dense(self, S: CSR, p: np.ndarray, n: int):
        """Device-resident dense finisher — the TPU-first replacement for
        both echelonize_dense (spasm_echelonize.c:385-463) and
        echelonize_dense_lowrank (:315-379).

        The matrix's entries are uploaded ONCE (DeviceCSR); every round
        then runs entirely on device: form a block (actual rows, or
        random sparse-weight combinations when the residual is tall) ->
        eliminate against the full pivot basis (chunked scan) -> compact
        to the free columns -> row-sweep RREF (dense/rowrref.py, whose
        sequential cost scales with the block's rows, not the width) ->
        register the new reduced rows as a device chunk of the basis.
        Per round, only the (B,) pivot-column map crosses device->host.
        Measured context (tunneled TPU): ~65 MB/s up / ~20 MB/s down /
        ~28 ms per sync — which is why no matrix-sized array may cross
        the link in either direction.
        """
        import jax.numpy as jnp
        from .device_csr import DeviceCSR
        from .dense.elim import _size_bucket
        import spasm_tpu.dense.rowrref as _rr
        rref_rows_device = _rr.rref_rows_device

        opts = self.opts
        m = self.m
        prime = self.prime
        t0 = time.time()
        old_un = self.U.n
        dcsr = DeviceCSR(S)                  # the one bulk upload
        mp = dcsr.mp

        qfree = np.nonzero(self.U.qinv < 0)[0]
        nq = qfree.size
        M = _size_bucket(nq + 1, 64)         # compacted width + dead col
        qsel = np.full(M, mp - 1, np.int64)  # dead slots -> dead col of X
        qsel[:nq] = qfree
        qsel_d = jnp.asarray(qsel)
        q_ext = np.full(M, m, np.int64)      # slot -> global column
        q_ext[:nq] = qfree

        rank_ub = min(n, nq)
        aspect = n / max(nq, 1)
        lowrank = (opts.enable_tall_and_skinny
                   and aspect > opts.tall_and_skinny_ratio)
        # block height: HBM budget on the full-width block, including
        # the arithmetic tier's temporaries (d >= 3 runs int64-emulated
        # reductions whose live temps are ~4x the d = 2 path); the
        # row-sweep RREF is also fastest near 4096 (its left-looking
        # panel matmuls re-read the block once per panel, O(B^2 M))
        tier_bytes = 8 if dcsr.F.ndigits == 2 else 32
        B = 1024
        while B < rank_ub + 64 and B * mp * tier_bytes <= (6 << 30) \
                and B < 4096:
            B <<= 1
        w = int(np.ceil(-np.log(0.01) * n / max(rank_ub, 1))) \
            if opts.low_rank_start_weight < 0 else \
            max(opts.low_rank_start_weight, 1)
        rng = np.random.default_rng(0xD1CE)
        from .dense.rowrref import CompactBasis
        basis = CompactBasis(M, prime)
        cand_mask_d = None
        processed = 0
        rounds = 0
        log.info("[finish/device] %s mode: %d rows x %d free cols, "
                 "block %d", "lowrank" if lowrank else "rows", n, nq, B)
        while rank_ub > 0:
            if lowrank:
                N = min(B, rank_ub + 64)
                sel = p[rng.integers(0, n, size=(N, w))]
                coeffs = rng.integers(1, prime, size=(N, w))
                coeffs = self.field.narray(coeffs).astype(np.int32)
                coeffs[:, 0] = 1
                Xd = dcsr.combine(sel, coeffs, Np=_size_bucket(N, 64))
            else:
                N = min(B, n - processed)
                if N <= 0:
                    break
                Xd = dcsr.densify(p[processed:processed + N],
                                  Bp=_size_bucket(N, 64))
                processed += N
            # full-width structural elimination, then compact to the
            # free columns and eliminate the finisher basis there (its
            # pivots all live on free columns — no full-width gather).
            # No coefficient parking (no L here) and no empty-chunk
            # conds: the blocks are dense in the coefficient columns.
            Xd = self.elim.eliminate_device(Xd, park=False,
                                            skip_empty=False)
            Xq = Xd[:, qsel_d]
            del Xd          # free the full-width block before the RREF
            Xq = basis.apply(Xq)
            Xq, pivcol = rref_rows_device(Xq, prime, nb=128)
            hit = np.nonzero(pivcol >= 0)[0]
            rr = hit.size
            if rr:
                # pad the new chunk to a row bucket (dead rows pivot at
                # the dead column) to bound compile variants
                Kp = _size_bucket(rr, 64)
                hit_p = np.zeros(Kp, np.int64)
                hit_p[:rr] = hit
                Rd = Xq[jnp.asarray(hit_p)]
                Rd = Rd * (jnp.arange(Kp) < rr)[:, None].astype(Rd.dtype)
                jpos = np.full(Kp, M - 1, np.int64)
                jpos[:rr] = pivcol[hit]
                basis.add(Rd, jpos)
                rank_ub -= rr
            rounds += 1
            log.info("[finish/device] round %d: %d rows -> %d new pivots",
                     rounds, N, rr)
            if lowrank and rank_ub > 0 and rr < 0.9 * N:
                if cand_mask_d is None:
                    mask = np.zeros(S.n, bool)
                    mask[p[:n]] = True
                    cand_mask_d = jnp.asarray(mask)
                if self._completion_device(dcsr, cand_mask_d, qsel_d,
                                           basis, rounds):
                    break
                log.info("[finish/device] completion test failed; "
                         "weight %d -> %d", w, 2 * w)
                w = min(2 * w, max(n, 1))
        # register the basis (final back-reduced versions) into U; the
        # engine's eliminator gets the chunks too so later engine stages
        # (host finishers, schur) see the full pivot set
        for Rd, jd in basis.chunks:
            jpos = np.asarray(jd)
            real = jpos < M - 1
            if not np.any(real):
                continue
            jr = jpos[real]
            Rr = Rd[jnp.asarray(np.nonzero(real)[0])]
            self.elim.append_device_chunk(Rr, q_ext, jr, dead_col=True)
            self.U.add_dense_rows_device(Rr, q_ext, q_ext[jr])
        log.info("[finish/device] done in %.1fs, %d new pivots",
                 time.time() - t0, self.U.n - old_un)

    @annotate("finish_gplu")
    def finish_gplu(self, S: CSR, p: np.ndarray, n: int, p_in):
        """Sparse Gilbert-Peierls finisher with leftmost pivoting and
        probabilistic early abort (echelonize_GPLU,
        spasm_echelonize.c:54-187).  Native C++ when available."""
        from . import native
        if native.HAVE_NATIVE:
            return self._finish_gplu_native(S, p, n, p_in)
        return self._finish_gplu_py(S, p, n, p_in)

    def _finish_gplu_native(self, S: CSR, p: np.ndarray, n: int, p_in,
                            chunk: int = 8192):
        from . import native
        want_L = self.L is not None
        k = 0
        t0 = time.time()
        old_un = self.U.n
        # ONE snapshot; new pivot rows append in amortized O(nnz) instead
        # of an O(nnz(U)) repack per chunk (quadratic over the run)
        Ug = _GrowingCSR(self.U.snapshot_csr())
        while k < n:
            rows = np.asarray(p[k:k + chunk], np.int64)
            row_origin = (np.asarray(p_in, np.int64)[rows]
                          if p_in is not None else rows)
            # without L we may stop once no free column remains; with L
            # every row must be processed (elimination coefficients)
            max_piv = n if want_L else min(n - k, self.m - self.U.n)
            if max_piv <= 0 and not want_L:
                break
            npiv, urows, (li, lj, lx), piv_origin = native.gplu(
                S, rows, row_origin, Ug, self.U.qinv, self.prime,
                want_L, max(max_piv, 1))
            stage = []
            for cols, vals in urows:
                self.U.rows.append((cols, vals))
                self.U.pivcol.append(int(cols[0]))
                Ug.append_row(cols, vals)
                stage.append((cols.astype(np.int64), vals, int(cols[0])))
            self.elim.append_rows(stage, flush=False)
            if want_L and li.size:
                self.L.add_batch(li, lj, lx)
            self.Lp.extend(int(v) for v in piv_origin)
            k += chunk
            if k < n and npiv == 0 and not want_L:
                if self.test_completion(S, p[k:], n - k):
                    log.info("[GPLU] early abort: completion test passed")
                    break
        log.info("[GPLU] done in %.1fs, %d new pivots",
                 time.time() - t0, self.U.n - old_un)

    def _finish_gplu_py(self, S: CSR, p: np.ndarray, n: int, p_in):
        opts = self.opts
        m = self.m
        r_ub = min(S.n, m)
        U_dyn = None
        x = np.zeros(m, dtype=np.int64)
        F = self.field
        rows_since_piv = 0
        early_done = False
        qinv = self.U.qinv
        for k in range(n):
            if self.L is None and self.U.n == r_ub:
                log.info("[GPLU] full rank reached")
                break
            if (self.L is None and not early_done and rows_since_piv > 10
                    and rows_since_piv > n / 100):
                log.info("[GPLU] testing for early abort...")
                if self.test_completion(S, p[k:], n - k):
                    break
                early_done = True
            rows_since_piv += 1
            inew = int(p[k])
            iorig = int(p_in[inew]) if p_in is not None else inew
            U_csr = self.U.snapshot_csr()
            pattern, x = sparse_triangular_solve(U_csr, S, inew, qinv, x)
            live = pattern[x[pattern] != 0]
            cand = live[qinv[live] < 0]
            if self.L is not None:
                onpiv = live[qinv[live] >= 0]
                if onpiv.size:
                    self.L.add_batch(np.full(onpiv.size, iorig, np.int64),
                                     qinv[onpiv], x[onpiv])
            if cand.size == 0:
                continue
            jpiv = int(cand.min())
            pivval = int(x[jpiv])
            if self.L is not None:
                self.L.add(iorig, self.U.n, pivval)
            self.Lp.append(iorig)
            beta = F.inverse(pivval)
            keep = np.sort(cand)
            vals = F.mul(np.int64(beta), x[keep])
            self._push_u_row(jpiv, keep, vals)
            rows_since_piv = 0
            early_done = False


def echelonize(A: CSR, opts: Optional[EchelonizeOptions] = None) -> LU:
    """Compute a row echelon form of A (optionally a full PLUQ).

    Returns an LU object: U (rank x m CSR, unitary first-entry pivots),
    qinv; plus L and p when opts.L (A == L@U when opts.complete).
    (reference: spasm_echelonize, spasm_echelonize.c:473-617)
    """
    if opts is None:
        opts = EchelonizeOptions()
    else:
        opts = dataclasses.replace(opts)
    if opts.complete:
        opts.L = True
    if opts.L:
        opts.enable_tall_and_skinny = False

    n, m = A.n, A.m
    t0 = time.time()
    log.info("[echelonize] start on %d x %d, %d nnz", n, m, A.nnz)
    eng = _Engine(A, opts)

    S = A
    p_in = None
    npiv = 0
    p = np.arange(n, dtype=np.int64)
    status = 0
    rnd = 0
    density = A.nnz / max(n * m, 1)

    # -- checkpoint/resume (TPU-build extension, SURVEY.md §5.4) -----------
    ckfile = opts.checkpoint_file
    fp = ckpt.matrix_fingerprint(A) if ckfile else None
    resume_phase = None
    dense_processed = 0
    if ckfile:
        state = ckpt.load_checkpoint(ckfile, fp, A.prime, opts.L,
                                     opts.complete)
        if state is not None:
            ckpt.restore_engine(eng, state)
            S = ckpt.restored_S(state, A.prime)
            p_in = state.get("p_in")
            rnd = int(state["rnd"])
            density = float(state["density"])
            status = int(state["status"])
            resume_phase = int(state["phase"])
            npiv = int(state["npiv"])
            p = state["p"] if "p" in state \
                else np.arange(S.n, dtype=np.int64)
            dense_processed = int(state["processed"])
            log.info("[checkpoint] resumed from %s: phase=%d rnd=%d "
                     "rank=%d", ckfile, resume_phase, rnd, eng.U.n)

    in_finisher = resume_phase in (ckpt.PHASE_FINISH, ckpt.PHASE_DENSE)
    if not in_finisher:
        while rnd < opts.max_round:
            if S.nnz == 0:
                status = 1
                break
            log.info("[echelonize] round %d", rnd)
            npiv, p = eng.extract_structural(S, p_in)
            # TPU-first policy: once the free-column count fits a dense
            # device block, the remaining rank belongs on the MXU —
            # skip further sparse Schur rounds (each would eliminate
            # EVERY remaining row just to look for more structural
            # pivots; the device finisher touches ~rank rows instead)
            nfree = m - eng.U.n
            itemsize = 2 if A.prime <= 65535 else 4
            # the d >= 3 arithmetic tiers run int64-emulated reductions
            # whose temporaries (and compile times) grow steeply with
            # width: cap them at a quarter of the d = 2 width
            wcap = opts.device_dense_width if itemsize == 2 \
                else opts.device_dense_width // 4
            basis_bytes = nfree * min(S.n - npiv, nfree) * itemsize
            if (not opts.L and opts.enable_dense
                    and 0 < nfree <= wcap
                    and (S.n - npiv) * nfree >= opts.device_dense_min
                    and basis_bytes <= opts.device_dense_mem):
                log.info("[echelonize] %d free columns fit the device "
                         "finisher; skipping sparse rounds", nfree)
                status = 3
                break
            if npiv < opts.min_pivot_proportion * min(S.n, m - eng.U.n):
                log.info("[echelonize] not enough pivots found; stopping")
                status = 2
                break
            U_csr = eng.U.snapshot_csr()
            with phase("density_estimate"):
                # fresh sample rows every round (the reference samples
                # through its PRNG, spasm_schur.c:24)
                density = estimate_density(S, p[npiv:], S.n - npiv, U_csr,
                                           eng.U.qinv, 100, seed=1 + rnd)
            if density > opts.sparsity_threshold:
                log.info("[echelonize] Schur complement is dense (%.2f%%)",
                         100 * density)
                status = 2
                break
            fact_view = LU(eng.U.n, U_csr, eng.U.qinv)
            with phase("schur_sparse"):
                S2, p_out = schur_sparse(S, p[npiv:], S.n - npiv,
                                         fact_view, density, eng.L, p_in,
                                         eliminator=eng.elim)
            S = S2
            p_in = p_out
            npiv = 0
            p = np.arange(S.n, dtype=np.int64)
            rnd += 1
            if ckfile:
                ckpt.save_checkpoint(ckfile, fingerprint=fp, engine=eng,
                                     S=S, p_in=p_in, rnd=rnd,
                                     phase=ckpt.PHASE_ROUND,
                                     density=density)

        if status == 0:
            npiv = 0
            p = np.arange(S.n, dtype=np.int64)

    if status != 1:
        nrem = S.n - npiv
        if ckfile and not in_finisher:
            ckpt.save_checkpoint(ckfile, fingerprint=fp, engine=eng, S=S,
                                 p_in=p_in, rnd=rnd,
                                 phase=ckpt.PHASE_FINISH, p=p, npiv=npiv,
                                 density=density, status=status)

        # snapshotting repacks U + S (O(nnz)); per-block that can dominate
        # the finisher, so throttle to one save per interval (the last
        # finished block is re-done on resume — bounded, not quadratic)
        last_save = [time.time()]

        def dense_cb(processed):
            if time.time() - last_save[0] < opts.checkpoint_interval_s:
                return
            ckpt.save_checkpoint(ckfile, fingerprint=fp, engine=eng, S=S,
                                 p_in=p_in, rnd=rnd,
                                 phase=ckpt.PHASE_DENSE, p=p, npiv=npiv,
                                 density=density, status=status,
                                 processed=processed)
            last_save[0] = time.time()

        cb = dense_cb if ckfile else None
        aspect = nrem / max(m - eng.U.n, 1)
        log.info("[echelonize] finishing; density=%.3f aspect=%.1f",
                 density, aspect)
        nfree = m - eng.U.n
        itemsize = 2 if A.prime <= 65535 else 4
        wcap = opts.device_dense_width if itemsize == 2 \
            else opts.device_dense_width // 4
        use_device_finish = (
            status == 3
            or (not opts.L and opts.enable_dense
                and 0 < nfree <= wcap
                and nrem * nfree >= opts.device_dense_min
                and nfree * min(nrem, nfree) * itemsize
                <= opts.device_dense_mem
                and (density > opts.sparsity_threshold
                     or (opts.enable_tall_and_skinny
                         and aspect > opts.tall_and_skinny_ratio))))
        if resume_phase == ckpt.PHASE_DENSE:
            # re-enter the blocked dense finisher where it left off
            eng.finish_dense(S, p[npiv:], nrem, p_in, checkpoint_cb=cb,
                             processed=dense_processed)
        elif use_device_finish:
            eng.finish_device_dense(S, p[npiv:], nrem)
        elif (opts.enable_tall_and_skinny
                and aspect > opts.tall_and_skinny_ratio):
            eng.finish_dense_lowrank(S, p[npiv:], nrem)
        elif opts.enable_dense and density > opts.sparsity_threshold:
            eng.finish_dense(S, p[npiv:], nrem, p_in, checkpoint_cb=cb)
        elif opts.enable_GPLU:
            eng.finish_gplu(S, p[npiv:], nrem, p_in)
        else:
            log.info("[echelonize] no finisher enabled; "
                     "incomplete echelonization returned")

    if ckfile:
        import os
        if os.path.exists(ckfile):
            os.unlink(ckfile)

    # U materializes lazily: rank-only consumers (tools/rank) never pay
    # the matrix-sized device->host transfer of the basis
    r = eng.U.n
    fact = LU(r, None, eng.U.qinv.copy(), u_thunk=eng.U.snapshot_csr)
    if opts.L:
        fact.L = eng.L.build(n, r)
        fact.p = np.asarray(eng.Lp[:r], dtype=np.int64)
        fact.complete = opts.complete
    nnz = eng.U.nnz()
    log.info("[echelonize] done in %.1fs; rank %d%s",
             time.time() - t0, r,
             ", %d nz in basis" % nnz if nnz >= 0 else "")
    return fact
