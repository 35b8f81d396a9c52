"""Pallas panel kernel for small primes (digit tier d == 2, p <= 65279).

One Mosaic program runs the whole latency-bound part of a panel step of
the blocked elimination (see dense/elim.py):

  1. division-free pivot *discovery* sweep over the (nb, n) transposed
     panel (cross-multiplication preserves zero patterns, so the pivot
     choices equal the classical normalized sweep's);
  2. assembly of the pivot minor W[t, b] = P0[r_t, b] from the original
     panel (identity rows/columns on empty slots);
  3. division-free Gauss-Jordan (RREF mode) or forward elimination
     (LU mode) of [W | I] with diagonal pivots — valid because W's
     leading minors are the (nonsingular) pivot minors;
  4. ONE batched Fermat inversion of the final diagonal, yielding
     Z = W^-1 (RREF) or Zlu = D^-1 Lambda^-1 and Vup = D^-1 Omega (LU);
  5. (LU) backward inversion of the unit-upper Vup -> Vinv.

The MXU matmuls (U = Z @ S[R, :], S -= G @ U) stay in XLA where the
compiler tiles them onto the systolic array; this kernel removes the
~4000 sequential small XLA ops per matrix that otherwise dominate
wall-clock (each sequential elimination step is latency- not
throughput-bound).

Arithmetic: pure int32 with float32-reciprocal Barrett reduction.
Division-free updates are bounded by 2*(p/2)^2 < 2^31 for p <= 65535,
which covers the whole d == 2 digit tier (p <= 65279).

Layout: the panel rides TRANSPOSED (nb, n) so the per-step column access
P[:, t] and the W-row store hit the sublane (major) dimension; pivot-row
extraction is a masked lane reduction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# division-free update bound: 2 * (p//2)^2 < 2^31  =>  p <= 65535;
# quantized to the d == 2 digit tier so one gate covers kernel + matmul
PALLAS_MAX_PRIME = 65279


def _reduce31(x, p, invp, rounds: int = 2):
    """Balanced x mod p for int32 x, division-free (exact for any int32:
    wrap-around in q*p cancels in two's complement)."""
    x = x.astype(jnp.int32)
    for _ in range(rounds):
        q = jnp.rint(x.astype(jnp.float32) * invp).astype(jnp.int32)
        x = x - q * p
    half = (p - jnp.int32(1)) >> jnp.int32(1)
    x = jnp.where(x > half, x - p, x)
    x = jnp.where(x < -half, x + p, x)
    return x.astype(jnp.int32)


def _modinv32(a, p, invp):
    """Batched Fermat inverse, int32 (p <= 65279 -> 17 exponent bits)."""
    def body(_, st):
        result, base, e = st
        prod = _reduce31(result * base, p, invp)
        result = jnp.where((e & 1) == 1, prod, result).astype(jnp.int32)
        base = _reduce31(base * base, p, invp)
        return result, base, (e >> 1).astype(jnp.int32)

    a = _reduce31(a, p, invp)
    one = jnp.full_like(a, 1)
    result, _, _ = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(17), body,
        (one, a, (p - 2).astype(jnp.int32)))
    return result


def _panel_kernel(p_ref, Pt_ref, ispiv_ref,
                  lrows_out, lhas_out, ispiv_out, Z_out, *extra,
                  nb: int, rref: bool):
    """See module docstring.  extra = (Vinv_out,) in LU mode, then the
    two VMEM scratch buffers (Pt work copy and [W | I])."""
    if rref:
        (Pt, M) = extra
    else:
        (Vinv_out, Pt, M) = extra
    p = p_ref[0, 0]
    invp = jnp.float32(1.0) / p.astype(jnp.float32)
    n = Pt_ref.shape[1]
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    lane_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    sub_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    lane_2nb = jax.lax.broadcasted_iota(jnp.int32, (nb, 2 * nb), 1)
    sub_2nb = jax.lax.broadcasted_iota(jnp.int32, (nb, 2 * nb), 0)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)

    Pt[:, :] = Pt_ref[:, :]
    ispiv_out[:, :] = ispiv_ref[:, :]
    lrows_out[:, :] = jnp.full((1, nb), -1, jnp.int32)
    lhas_out[:, :] = jnp.zeros((1, nb), jnp.int32)
    # [W | I] with identity pre-loaded on both halves (empty slots keep
    # their identity row; valid slots overwrite the left half)
    M[:, :] = jnp.where(
        jnp.logical_or(lane_2nb == sub_2nb, lane_2nb - nb == sub_2nb),
        jnp.int32(1), jnp.int32(0))

    # ---- phase 1: discovery sweep + W assembly --------------------------
    def step(t, _):
        col = Pt[pl.ds(t, 1), :]                        # (1, n)
        ispiv = ispiv_out[:, :]
        avail = jnp.logical_and(ispiv == 0, col != 0)
        availi = jnp.where(avail, jnp.int32(1), jnp.int32(0))
        has = jnp.max(availi, axis=1, keepdims=True)    # (1, 1)
        hasb = has == 1
        r = jnp.min(jnp.where(avail, lane_n, jnp.int32(n)), axis=1,
                    keepdims=True)                      # (1, 1) first avail
        at_r = lane_n == r                              # (1, n)
        v = jnp.sum(jnp.where(at_r, col, jnp.int32(0)), axis=1, keepdims=True, dtype=jnp.int32)
        v = jnp.where(hasb, v, jnp.int32(1))
        # original panel row r -> row t of W (transpose via diag trick)
        worig = jnp.sum(jnp.where(at_r, Pt_ref[:, :], jnp.int32(0)), axis=1,
                        keepdims=True, dtype=jnp.int32)                  # (nb, 1)
        wrow = jnp.sum(jnp.where(lane_nb == sub_nb,
                                 jnp.broadcast_to(worig, (nb, nb)), jnp.int32(0)),
                       axis=0, keepdims=True, dtype=jnp.int32)           # (1, nb)
        eyerow = jnp.where(slot_iota == t, jnp.int32(1), jnp.int32(0))
        M[pl.ds(t, 1), pl.ds(0, nb)] = jnp.where(hasb, wrow, eyerow)
        # division-free update of the working panel
        g = jnp.where(jnp.logical_and(avail, jnp.logical_not(at_r)),
                      col, jnp.int32(0))                # (1, n)
        prow = jnp.sum(jnp.where(at_r, Pt[:, :], jnp.int32(0)), axis=1,
                       keepdims=True, dtype=jnp.int32)                   # (nb, 1)
        Pt[:, :] = _reduce31(v * Pt[:, :] - prow * g, p, invp)
        sel = slot_iota == t
        hasm = jnp.logical_and(sel, hasb)
        lrows_out[:, :] = jnp.where(
            hasm, r, jnp.where(sel, jnp.int32(-1), lrows_out[:, :]))
        lhas_out[:, :] = jnp.where(hasm, jnp.int32(1), lhas_out[:, :])
        ispiv_out[:, :] = jnp.where(
            jnp.logical_and(at_r, hasb), jnp.int32(1), ispiv_out[:, :])
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), step, jnp.int32(0))

    # mask invalid slot *columns* of W back to identity
    lhas_lane = lhas_out[:, :] == 1                     # (1, nb) lanes
    Wleft = M[:, pl.ds(0, nb)]
    eye_nb = jnp.where(lane_nb == sub_nb, jnp.int32(1), jnp.int32(0))
    M[:, pl.ds(0, nb)] = jnp.where(lhas_lane, Wleft, eye_nb)

    # ---- phase 2: division-free elimination of [W | I] ------------------
    def estep(t, _):
        piv = M[pl.ds(t, 1), :]                         # (1, 2nb)
        v = jnp.sum(jnp.where(lane_2nb[0:1, :] == t, piv, jnp.int32(0)), axis=1,
                    keepdims=True, dtype=jnp.int32)                      # (1, 1)
        gcol = jnp.sum(jnp.where(lane_2nb == t, M[:, :], jnp.int32(0)), axis=1,
                       keepdims=True, dtype=jnp.int32)                   # (nb, 1)
        subv = sub_2nb[:, 0:1]
        if rref:
            g = jnp.where(subv == t, v - jnp.int32(1), gcol)
            M[:, :] = _reduce31(v * M[:, :] - g * piv, p, invp)
        else:
            g = jnp.where(subv > t, gcol, jnp.int32(0))
            Mnew = _reduce31(v * M[:, :] - g * piv, p, invp)
            M[:, :] = jnp.where(subv > t, Mnew, M[:, :])
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), estep, jnp.int32(0))

    # ---- phase 3: one batched Fermat on the diagonal --------------------
    dvals = jnp.sum(jnp.where(lane_nb == sub_nb, M[:, pl.ds(0, nb)], jnp.int32(0)),
                    axis=1, keepdims=True, dtype=jnp.int32)              # (nb, 1)
    dinv = _modinv32(dvals, p, invp)
    Z_out[:, :] = _reduce31(dinv * M[:, pl.ds(nb, nb)], p, invp)

    if not rref:
        # Vup = D^-1 Omega (unit upper); invert it backward in-place
        Vup = _reduce31(dinv * M[:, pl.ds(0, nb)], p, invp)
        M[:, pl.ds(0, nb)] = Vup
        Vinv_out[:, :] = eye_nb

        def bstep(t, _):
            i = nb - 1 - t
            vrow = M[pl.ds(i, 1), pl.ds(0, nb)]          # (1, nb) V[i, :]
            # transpose V[i, :] to a column via the diag trick
            vcol = jnp.sum(jnp.where(lane_nb == sub_nb,
                                     jnp.broadcast_to(vrow, (nb, nb)), jnp.int32(0)),
                           axis=1, keepdims=True, dtype=jnp.int32)        # (nb, 1)
            vcol = jnp.where(sub_nb[:, 0:1] > i, vcol, jnp.int32(0))
            terms = _reduce31(vcol * Vinv_out[:, :], p, invp)
            prod = jnp.sum(terms, axis=0, keepdims=True, dtype=jnp.int32)  # (1, nb) <= nb*p/2
            row = _reduce31(-prod, p, invp)
            row = jnp.where(slot_iota == i, row + jnp.int32(1), row)
            Vinv_out[:, :] = jnp.where(sub_nb[:, 0:1] == i, row,
                                       Vinv_out[:, :])
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), bstep, jnp.int32(0))


def _call(kernel, Pt, ispiv, p32, nb: int, n: int, nout_extra: int,
          interpret: bool = False):
    out_shapes = [
        jax.ShapeDtypeStruct((1, nb), jnp.int32),     # lrows
        jax.ShapeDtypeStruct((1, nb), jnp.int32),     # lhas
        jax.ShapeDtypeStruct((1, n), jnp.int32),      # ispiv'
        jax.ShapeDtypeStruct((nb, nb), jnp.int32),    # Z / Zlu
    ]
    if nout_extra:
        out_shapes.append(jax.ShapeDtypeStruct((nb, nb), jnp.int32))  # Vinv
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shapes),
        scratch_shapes=[pltpu.VMEM((nb, n), jnp.int32),
                        pltpu.VMEM((nb, 2 * nb), jnp.int32)],
        interpret=interpret,
    )(p32.reshape(1, 1), Pt, ispiv)


@functools.partial(jax.jit, static_argnames=("nb", "rref", "interpret"))
def panel_pivots_small_p(Pt, ispiv, p32, nb: int, rref: bool,
                         interpret: bool = False):
    """Run the Mosaic panel kernel.

    Pt: (nb, n) int32 transposed panel (n a multiple of 128);
    ispiv: (1, n) int32; p32: (1, 1)-able int32.

    Returns (lrows, lhas, ispiv', Z) in RREF mode, plus Vinv in LU mode —
    all int32; Z = W^-1 (RREF) or D^-1 Lambda^-1 (LU), Vinv = the inverse
    of the unit-upper D^-1 Omega.
    """
    n = Pt.shape[1]
    kernel = functools.partial(_panel_kernel, nb=nb, rref=rref)
    return _call(kernel, Pt, ispiv, p32, nb, n, 0 if rref else 1,
                 interpret)


_PALLAS_OK = None


def pallas_available() -> bool:
    """True when the Mosaic compiler accepts the panel kernel on the
    current default backend (cached; False on CPU or compile failure)."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            if jax.default_backend() != "tpu":
                _PALLAS_OK = False
            else:
                nb, n = 8, 128
                Pt = jnp.zeros((nb, n), jnp.int32)
                iv = jnp.zeros((1, n), jnp.int32)
                p32 = jnp.full((1, 1), 42013, jnp.int32)
                out = panel_pivots_small_p(Pt, iv, p32, nb, True)
                jax.block_until_ready(out)
                _PALLAS_OK = True
        except Exception:  # pragma: no cover - environment-dependent
            _PALLAS_OK = False
    return _PALLAS_OK
