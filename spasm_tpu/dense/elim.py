"""Blocked rank-revealing dense elimination over GF(p) on device.

Replaces the reference's FFPACK bridge (spasm_ffpack.cpp:22-75,
FFPACK::pReducedRowEchelonForm / FFPACK::pPLUQ) with a TPU-native design:

  * columns are processed left-to-right in panels of NB;
  * inside a panel, an unblocked sweep (lax.fori_loop) performs exact
    sequential column-pivoted elimination on the (n, NB) panel only,
    recording for each local step k the factor column g_k, the pivot row
    r_k and the pivot inverse c_k;
  * the effect of the whole panel on the trailing columns is *composed*:
    with M[k,l] = g_l[r_k] (strictly lower) and T = I + diag(c) @ M,
    the normalized pivot rows are  U = T^-1 @ (c * S[r, :])  and the
    trailing update is one MXU matmul   S -= G @ U   (mod p).

  Rank deficiency is handled by masking: a column with no available
  nonzero contributes a zero factor/row slot, which is algebraically a
  no-op.  This keeps every shape static for XLA while the reference's
  FFPACK performs data-dependent row/column rotations.

  RREF mode eliminates every row (the final matrix rows at the pivot rows
  are the fully reduced echelon rows); LU mode eliminates only
  not-yet-pivotal rows and records multipliers L (A_block == L @ U).

The uniform-update trick: a sequential RREF step is
    S <- S - outer(g, u)   with   g = S[:, j],  g[r] -= 1  (u has pivot 1)
which zeroes column j everywhere and leaves the normalized row u at row r
in a single rank-1 update — no row swap, no scatter.

The prime is a runtime scalar (one compiled kernel per shape bucket and
digit tier, not per prime).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .modp import (dnorm, dnorm64, modinv, matmul_digits, device_field,
                   mulmod)

_NB = 64          # panel width (local sweep length)


class _PanelOut(NamedTuple):
    P: jnp.ndarray        # (n, NB) eliminated panel
    G: jnp.ndarray        # (n, NB) factor columns (uniform-update g's)
    C: jnp.ndarray        # (NB,)  pivot inverses (1 on empty slots)
    lrows: jnp.ndarray    # (NB,)  pivot row per slot (-1 if none)
    lhas: jnp.ndarray     # (NB,)  slot validity
    pivvals: jnp.ndarray  # (NB,)  pivot values (0 on empty slots)
    is_piv: jnp.ndarray   # (n,)   updated pivot-row mask


def _panel_sweep(P, is_piv, p, rref: bool, rounds: int = 2) -> _PanelOut:
    n, nb = P.shape

    def step(t, carry):
        P, G, C, lrows, lhas, pvals, is_piv = carry
        col = P[:, t]
        avail = jnp.logical_and(~is_piv, col != 0)
        has = jnp.any(avail)
        r = jnp.argmax(avail)
        pivval = col[r].astype(jnp.int64)
        c = modinv(pivval, p)
        u = dnorm(P[r, :].astype(jnp.int64) * c, p, rounds)
        u = jnp.where(has, u, 0)
        if rref:
            g = jnp.where(has, col, 0)
            g = g.at[r].set(jnp.where(has, (pivval - 1).astype(jnp.int32),
                                      g[r]))
        else:
            # LU: eliminate only available rows, and not the pivot row
            mask = jnp.logical_and(avail, jnp.arange(n) != r)
            g = jnp.where(mask, col, 0)
        P = dnorm(P.astype(jnp.int64)
                  - g[:, None].astype(jnp.int64) * u[None, :].astype(jnp.int64),
                  p, rounds)
        G = G.at[:, t].set(g)
        C = C.at[t].set(jnp.where(has, c, 1).astype(jnp.int64))
        lrows = lrows.at[t].set(jnp.where(has, r, -1).astype(jnp.int32))
        lhas = lhas.at[t].set(has)
        pvals = pvals.at[t].set(jnp.where(has, pivval, 0).astype(jnp.int32))
        is_piv = is_piv.at[r].set(is_piv[r] | has)
        return P, G, C, lrows, lhas, pvals, is_piv

    init = (P,
            jnp.zeros((n, nb), jnp.int32),
            jnp.ones((nb,), jnp.int64),
            jnp.full((nb,), -1, jnp.int32),
            jnp.zeros((nb,), bool),
            jnp.zeros((nb,), jnp.int32),
            is_piv)
    out = jax.lax.fori_loop(0, nb, step, init)
    return _PanelOut(*out)


def _unit_lower_inverse(T, p):
    """Inverse of a unit lower-triangular (NB, NB) matrix mod p.

    Products are reduced term-wise before summation: NB terms of
    magnitude <= p/2 < 2^31 sum safely in int64.
    """
    nb = T.shape[0]

    def step(k, Tinv):
        # Tinv rows >= k are still zero, so T[k] @ Tinv = sum_{l<k} ...
        terms = mulmod(T[k, :, None], Tinv, p)        # (nb, nb) balanced
        prod = jnp.sum(terms, axis=0)
        row = dnorm(-prod, p).at[k].add(1)
        return Tinv.at[k, :].set(dnorm(row.astype(jnp.int64), p))

    return jax.lax.fori_loop(0, nb, step, jnp.zeros_like(T))


@functools.partial(jax.jit,
                   static_argnames=("d", "rref", "nb", "sweep_small"))
def _eliminate(S, p, weights, d: int, rref: bool, nb: int = _NB,
               sweep_small: bool = False):
    """Full blocked elimination.  S: (n, m) int32 balanced, m % nb == 0.

    Returns (S_final, pivrow_of_col (m,), is_piv (n,), L (n, m) or (n,1)).
    In LU mode, L slot column t of panel q holds the multiplier column of
    local step t (zero for empty slots); the host compacts it.
    """
    n, m = S.shape
    npanels = m // nb
    want_l = not rref

    # One Barrett round handles |x| <= p * 2^22; sweep inputs are bounded
    # by (p/2)^2 + p/2 = p*(p/4 + 1/2), so rounds=1 is exact for
    # p <= 2^24 (sweep_small static flag threaded from the host wrapper).
    rounds = 1 if sweep_small else 2

    def panel(q, carry):
        S, pivrow_of_col, is_piv, L = carry
        j0 = q * nb
        P = jax.lax.dynamic_slice(S, (0, j0), (n, nb))
        out = _panel_sweep(P, is_piv, p, rref, rounds)
        S = jax.lax.dynamic_update_slice(S, out.P, (0, j0))

        lrows_safe = jnp.where(out.lhas, out.lrows, 0)
        # small composed system: T = I + diag(c) * strict_lower(M)
        M = out.G[lrows_safe, :]                          # (nb, nb)
        M = jnp.where(out.lhas[:, None], M, 0)
        M = jnp.tril(M, -1)
        T = dnorm(jnp.eye(nb, dtype=jnp.int64)
                  + dnorm64(out.C[:, None] * M.astype(jnp.int64), p), p)
        Tinv = _unit_lower_inverse(T, p)

        rows = S[lrows_safe, :]                           # (nb, m)
        rows = jnp.where(out.lhas[:, None], rows, 0)
        rows = dnorm(out.C[:, None] * rows.astype(jnp.int64), p)
        U = matmul_digits(Tinv, rows, p, weights, d)      # (nb, m)
        # only trailing columns are touched (leading support is 0 by
        # construction, panel columns were updated by the sweep)
        colmask = jnp.arange(m) >= (j0 + nb)
        U = jnp.where(colmask[None, :], U, 0)
        delta = matmul_digits(out.G, U, p, weights, d)    # (n, m)
        S = dnorm(S.astype(jnp.int64) - delta.astype(jnp.int64), p)

        idx = j0 + jnp.arange(nb)
        pivrow_of_col = pivrow_of_col.at[idx].set(
            jnp.where(out.lhas, out.lrows, -1))
        if want_l:
            # multiplier column for slot t: g_t plus pivval at the pivot row
            Lcols = out.G.at[lrows_safe, jnp.arange(nb)].add(
                jnp.where(out.lhas, out.pivvals, 0))
            Lcols = jnp.where(out.lhas[None, :], Lcols, 0)
            L = jax.lax.dynamic_update_slice(L, Lcols, (0, j0))
        return S, pivrow_of_col, out.is_piv, L

    L0 = jnp.zeros((n, m if want_l else 1), jnp.int32)
    init = (S, jnp.full((m,), -1, jnp.int32),
            jnp.zeros((n,), bool), L0)
    S, pivrow_of_col, is_piv, L = jax.lax.fori_loop(0, npanels, panel, init)
    return S, pivrow_of_col, is_piv, L


def _size_bucket(x: int, quantum: int) -> int:
    """Round up to a power of two (<= 4096) or to a multiple of 512.

    Zero padding is algebraically inert here (no pivots from zero
    rows/columns); bucketing bounds the number of jit variants.
    """
    x = max(x, quantum)
    if x <= 4096:
        b = quantum
        while b < x:
            b <<= 1
        return b
    return -(-x // 512) * 512


def _pad(S: np.ndarray, nb: int) -> np.ndarray:
    n, m = S.shape
    mp = _size_bucket(max(m, 1), nb)
    np_ = _size_bucket(max(n, 1), 32)
    if mp == m and np_ == n:
        return S
    out = np.zeros((np_, mp), dtype=np.int32)
    out[:n, :m] = S
    return out


def _run(S: np.ndarray, p: int, rref: bool, nb: int):
    F = device_field(p)
    Sp = _pad(np.ascontiguousarray(S, np.int32), nb)
    return _eliminate(jnp.asarray(Sp), jnp.int64(p),
                      jnp.asarray(F.weights), F.ndigits, rref, nb,
                      p <= (1 << 24))


# Below this many elements a numpy sweep beats device dispatch + compile.
_HOST_LIMIT = 1 << 16


def _norm_np(x: np.ndarray, p: int) -> np.ndarray:
    r = x % p
    return np.where(r > p // 2, r - p, r)


def _sweep_np(S: np.ndarray, p: int, rref: bool):
    """Host reference elimination with the same pivot choices as the
    device kernel (first not-yet-pivotal row per column, no swapping)."""
    A = np.ascontiguousarray(S, np.int64)
    n, m = A.shape
    is_piv = np.zeros(n, dtype=bool)
    prows, pcols = [], []
    L = np.zeros((n, min(n, m)), np.int64) if not rref else None
    for j in range(m):
        col = A[:, j]
        avail = (~is_piv) & (col != 0)
        if not avail.any():
            continue
        r = int(np.argmax(avail))
        pivval = int(A[r, j])
        inv = pow(pivval, -1, p)
        inv = inv - p if inv > p // 2 else inv
        u = _norm_np(A[r] * inv, p)
        if rref:
            g = col.copy()
            g[r] = pivval - 1
            A = _norm_np(A - np.outer(g, u), p)
        else:
            g = np.where(avail, col, 0)
            g[r] = 0
            A = _norm_np(A - np.outer(g, u), p)
            L[:, len(prows)] = g
            L[r, len(prows)] = pivval
        prows.append(r)
        pcols.append(j)
        is_piv[r] = True
    prows = np.asarray(prows, np.int64)
    pcols = np.asarray(pcols, np.int64)
    return A, prows, pcols, L


def dense_rref(S: np.ndarray, p: int, nb: int = _NB, force: str = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Reduced row echelon form with column pivoting of S mod p.

    Input: (n, m) balanced int32 (numpy).  Output:
      R    (rank, m) fully reduced rows, pivot entry 1 at `pivcols[i]`,
           zero on every other pivot column, ordered by pivot column;
      pivcols (rank,) ascending pivot column indices.
    The analog of spasm_ffpack_rref (spasm_ffpack.cpp:78-86).
    """
    n, m = S.shape
    if force != "device" and (force == "host" or S.size <= _HOST_LIMIT):
        A, prows, pivcols, _ = _sweep_np(S, p, True)
        R = A[prows].astype(np.int32) if prows.size else \
            np.empty((0, m), np.int32)
        return R, pivcols
    Sf, pivrow_of_col, _, _ = _run(S, p, True, nb)
    pivrow_of_col = np.asarray(pivrow_of_col)[:m]
    pivcols = np.nonzero(pivrow_of_col >= 0)[0]
    rows = pivrow_of_col[pivcols]
    R = np.asarray(Sf)[rows][:, :m] if pivcols.size else \
        np.empty((0, m), np.int32)
    return R, pivcols.astype(np.int64)


def dense_lu(S: np.ndarray, p: int, nb: int = _NB, force: str = None):
    """Column-pivoted PLUQ-style factorization of S mod p.

    Returns (rank, prows, pivcols, L, Urows):
      prows   (rank,) pivot row of each pivot, in pivot (column) order
      pivcols (rank,) pivot column of each pivot (ascending)
      L       (n, rank)  with  S == L @ Urows  (exact, mod p)
      Urows   (rank, m)  unit-pivot upper rows (U[k, pivcols[k]] == 1)
    The analog of spasm_ffpack_LU (spasm_ffpack.cpp:88-96).
    """
    from ..field import Field
    n, m = S.shape
    if force != "device" and (force == "host" or S.size <= _HOST_LIMIT):
        F = Field(p)
        A, prows, pivcols, L = _sweep_np(S, p, False)
        rank = prows.size
        if rank:
            invs = F.inverse_array(A[prows, pivcols]).astype(np.int64)
            Urows = F.narray(A[prows] * invs[:, None])
            Lc = F.narray(L[:, :rank])
        else:
            Urows = np.empty((0, m), np.int32)
            Lc = np.empty((n, 0), np.int32)
        return rank, prows, pivcols, Lc, Urows
    Sf, pivrow_of_col, _, Lslots = _run(S, p, False, nb)
    pivrow_of_col = np.asarray(pivrow_of_col)[:m]
    pivcols = np.nonzero(pivrow_of_col >= 0)[0]
    rows = pivrow_of_col[pivcols]
    rank = pivcols.size
    Sf = np.asarray(Sf)
    F = Field(p)
    if rank:
        pivvals = Sf[rows, pivcols].astype(np.int64)
        inv = F.inverse_array(pivvals).astype(np.int64)
        Urows = F.narray(Sf[rows][:, :m].astype(np.int64) * inv[:, None])
        L = np.asarray(Lslots)[:n, pivcols]
    else:
        Urows = np.empty((0, m), np.int32)
        L = np.empty((n, 0), np.int32)
    return rank, rows.astype(np.int64), pivcols.astype(np.int64), L, Urows


def dense_rank(S: np.ndarray, p: int, nb: int = _NB,
               force: str = None) -> int:
    """Rank of a dense balanced int32 matrix mod p."""
    n, m = S.shape
    if n == 0 or m == 0:
        return 0
    if force != "device" and (force == "host" or S.size <= _HOST_LIMIT):
        _, prows, _, _ = _sweep_np(S, p, True)
        return int(prows.size)
    _, pivrow_of_col, _, _ = _run(S, p, True, nb)
    return int(np.count_nonzero(np.asarray(pivrow_of_col)[:m] >= 0))
