"""Row-sweep RREF: rank-revealing reduction with sequential cost
proportional to the number of ROWS, not columns.

The classic column sweep (dense/elim.py) runs one sequential step per
*column* — m steps.  The engine's finisher blocks are short and wide
(B rows over q >> B free columns), where m steps at the TPU's ~10 us
per sequential loop iteration dominate everything.  This kernel instead
sweeps over rows (B steps): each step finds the leftmost nonzero of the
current row (one VPU reduction), then applies a division-free Jordan
cross-multiplication update to every other row of the panel.

Blocked structure (nb-row panels) maintains the invariant that all
processed rows form a *fully reduced* (RREF) unit-pivot basis:
  * panel start: eliminate the panel against every prior pivot row with
    ONE masked MXU matmul — exact in one shot because priors are RREF;
  * within the panel: nb sequential division-free Jordan steps
        P <- v_k * P - P[:, j_k] (x) u_k
    (zero pattern preserved, so pivot choices match classical row
    elimination; eliminating above AND below keeps the panel mutually
    reduced with no composition step);
  * panel end: ONE batched Fermat inversion normalizes the panel's
    pivot rows, then one masked matmul back-reduces all prior rows
    against the new pivots.

Column choice is free (any echelon basis is valid for rank / kernel /
solve via qinv), exactly like the reference's column-pivoted FFPACK RREF
which reduces A*Q, not A (spasm_rref.c:10-20).

The last column of X must be dead (zero padding): row/column gathers
park out-of-range indices there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .modp import matmul_digits, modinv, dnorm64
from .elim import _mulsub, _submod, _scale_rows


@functools.partial(jax.jit, static_argnames=("d", "nb", "sweep_small"),
                   donate_argnums=(0,))
def _rref_rows(X, p, weights, d: int, nb: int = 64,
               sweep_small: bool = False):
    """Row-sweep RREF of X (B, M) int32 balanced, B % nb == 0, last
    column dead (all zero).  Returns (X', pivcol):

      pivcol[i] >= 0: row i of X' is a normalized (unit-pivot) basis row
        with its pivot at column pivcol[i], fully reduced against every
        other pivot row (RREF);
      pivcol[i] == -1: row i reduced to zero.
    """
    B, M = X.shape
    npanel = B // nb
    small = d == 2
    rounds = 1 if sweep_small else 2
    iota_nb = jnp.arange(nb)
    iota_B = jnp.arange(B)

    def panel(t, carry):
        X, pivcol = carry
        q0 = t * nb
        P = jax.lax.dynamic_slice(X, (q0, 0), (nb, M))
        # eliminate the panel against all prior pivots in one matmul
        # (priors are RREF + unit-pivot, so current values ARE the
        # coefficients); pivot-less rows gather the dead last column
        pcs = jnp.where(pivcol >= 0, pivcol, M - 1)
        C = P[:, pcs]                                     # (nb, B)
        C = jnp.where(((iota_B < q0) & (pivcol >= 0))[None, :], C, 0)
        delta = matmul_digits(C.astype(jnp.int32), X, p, weights, d)
        P = _submod(P, delta, p, small).astype(X.dtype)

        def step(k, c):
            P, pivl = c
            u = P[k]
            nz = u != 0
            has = jnp.any(nz)
            j = jnp.argmax(nz)
            v = jnp.where(has, u[j], 1)
            g = jnp.where((iota_nb != k) & has, P[:, j], 0)
            P = _mulsub(v, P, g[:, None], u[None, :], p, small,
                        rounds).astype(X.dtype)
            pivl = pivl.at[k].set(jnp.where(has, j, -1).astype(jnp.int32))
            return P, pivl

        P, pivl = jax.lax.fori_loop(
            0, nb, step, (P, jnp.full((nb,), -1, jnp.int32)))
        # normalize panel pivot rows (one batched Fermat inversion)
        pv = P[iota_nb, jnp.where(pivl >= 0, pivl, M - 1)]
        inv = dnorm64(modinv(jnp.where(pivl >= 0, pv, 1), p), p)
        P = _scale_rows(inv.astype(jnp.int32), P, p, small,
                        rounds).astype(X.dtype)
        X = jax.lax.dynamic_update_slice(X, P, (q0, 0))
        # back-reduce every prior row against the panel's new pivots so
        # the processed prefix stays fully RREF
        pcs2 = jnp.where(pivl >= 0, pivl, M - 1)
        C2 = X[:, pcs2]                                   # (B, nb)
        inpanel = (iota_B >= q0) & (iota_B < q0 + nb)
        C2 = jnp.where((~inpanel[:, None]) & (pivl >= 0)[None, :], C2, 0)
        delta2 = matmul_digits(C2.astype(jnp.int32), P.astype(jnp.int32),
                               p, weights, d)
        X = _submod(X, delta2, p, small).astype(X.dtype)
        pivcol = jax.lax.dynamic_update_slice(pivcol, pivl, (q0,))
        return X, pivcol

    return jax.lax.fori_loop(
        0, npanel, panel, (X, jnp.full((B,), -1, jnp.int32)))


def rref_rows_device(Xd, p: int, nb: int = 64):
    """Host-facing wrapper.  Xd: (B, M) device array, last column dead.
    Returns (Xd', pivcol (B,) np.ndarray).  nb is clamped so it divides
    B (all row buckets are powers of two or multiples of 512)."""
    from .modp import device_field
    F = device_field(p)
    B = Xd.shape[0]
    nb = min(nb, B)
    while B % nb:
        nb //= 2
    Xd, pivcol = _rref_rows(Xd, jnp.int64(p), jnp.asarray(F.weights),
                            F.ndigits, nb, p <= (1 << 23))
    return Xd, np.asarray(pivcol)


@functools.partial(jax.jit, static_argnames=("d",), donate_argnums=(0,))
def _basis_apply(X, R, jpos, p, weights, d: int):
    """Eliminate the pivots of a reduced basis block R from X.

    R: (K, M) mutually reduced unit-pivot rows, pivot of row k at column
    jpos[k] (dead rows: jpos -> the dead last column, where X is zero).
    One matmul — exact because R is RREF.  X is donated.
    """
    C = X[:, jpos]                                    # (B, K)
    small = d == 2
    delta = matmul_digits(C.astype(jnp.int32), R, p, weights, d)
    return _submod(X, delta, p, small).astype(X.dtype)


class CompactBasis:
    """Growing device-resident RREF basis over a fixed compacted width M.

    Used by the engine's device finisher: blocks eliminate against the
    basis with one matmul per stored chunk; new reduced rows append
    after back-reducing the existing chunks (so the basis stays RREF
    and single-matmul elimination remains exact).
    """

    def __init__(self, M: int, p: int):
        from .modp import device_field
        self.M = M
        self.p = p
        self.F = device_field(p)
        self.chunks = []          # (Rd (K, M), jpos_dev (K,))
        self.nrows = 0

    # Drain the device queue every few chunk applications: dispatch is
    # fully async and each application allocates multi-hundred-MB
    # temporaries (int64-emulated for d >= 3), so an unbounded queue of
    # in-flight programs can exhaust HBM even though each one fits.
    _DRAIN_EVERY = 4

    def apply(self, X):
        """Eliminate every basis pivot from X (B, M).  Consumes X."""
        p64 = jnp.int64(self.p)
        w = jnp.asarray(self.F.weights)
        for i, (Rd, jd) in enumerate(self.chunks):
            X = _basis_apply(X, Rd, jd, p64, w, self.F.ndigits)
            if (i + 1) % self._DRAIN_EVERY == 0:
                np.asarray(X[:1, :1])
        return X

    def add(self, Rd, jpos: np.ndarray):
        """Append reduced rows (pivots at compacted columns jpos), after
        back-reducing the existing chunks against them."""
        jd = jnp.asarray(np.asarray(jpos, np.int64))
        p64 = jnp.int64(self.p)
        w = jnp.asarray(self.F.weights)
        out = []
        for i, (Ri, ji) in enumerate(self.chunks):
            out.append((_basis_apply(Ri, Rd, jd, p64, w, self.F.ndigits),
                        ji))
            if (i + 1) % self._DRAIN_EVERY == 0:
                np.asarray(out[-1][0][:1, :1])
        self.chunks = out
        self.chunks.append((Rd, jd))
        self.nrows += int(np.asarray(jpos).size)
