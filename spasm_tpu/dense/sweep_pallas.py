"""Pallas panel-sweep kernel for small primes (p <= 92681).

The unblocked column sweep is the latency-bound part of the blocked
elimination: 64 sequential data-dependent steps.  Under XLA each step
costs ~30 dispatched VPU ops (~0.4 ms); in a single Mosaic kernel the
whole sweep runs from VMEM with no per-op overhead.

Small primes allow pure int32 arithmetic: balanced operands satisfy
(p/2)^2 + p/2 < 2^31 exactly up to p = 92681 — which covers the
reference's default modulus 42013 and its float/double FFPACK regimes.
Reduction is division-free (float32-reciprocal Barrett + corrections),
exact for |x| <= 2^31.

Layout: the panel is held TRANSPOSED (nb, n) so that both the per-step
column access P[:, t] and the factor store G[:, t] hit the sublane
(major) dimension, which Mosaic indexes dynamically without relayout.
The pivot row extraction P[r, :] becomes a masked lane reduction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PALLAS_MAX_PRIME = 92681     # (p//2)^2 + p//2 < 2^31


def _reduce31(x, p, invp):
    """Balanced x mod p for |x| < 2^31, int32 lanes, division-free."""
    x = x.astype(jnp.int32)
    for _ in range(2):
        q = jnp.rint(x.astype(jnp.float32) * invp).astype(jnp.int32)
        x = x - q * p
    half = (p - jnp.int32(1)) >> jnp.int32(1)    # p odd: == p // 2
    x = jnp.where(x > half, x - p, x)
    x = jnp.where(x < -half, x + p, x)
    return x.astype(jnp.int32)


def _modinv32(a, p, invp):
    """Fermat inverse with int32 arithmetic (scalar)."""
    def body(_, st):
        result, base, e = st
        prod = _reduce31(result * base, p, invp)
        result = jnp.where((e & 1) == 1, prod, result).astype(jnp.int32)
        base = _reduce31(base * base, p, invp)
        return result, base, (e >> 1).astype(jnp.int32)

    a = _reduce31(a, p, invp)
    one = jnp.full_like(a, 1)
    result, _, _ = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(18), body,
        (one, a, (p - 2).astype(jnp.int32)))           # p < 2^17.5
    return result


def _sweep_kernel(p_ref, Pt_ref, ispiv_ref,
                  Pt_out, G_out, C_out, lrows_out, lhas_out, pvals_out,
                  ispiv_out, *, nb: int, rref: bool):
    p = p_ref[0, 0]
    invp = jnp.float32(1.0) / p.astype(jnp.float32)
    n = Pt_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    Pt_out[:, :] = Pt_ref[:, :]
    ispiv_out[:, :] = ispiv_ref[:, :]
    G_out[:, :] = jnp.zeros((nb, n), jnp.int32)
    C_out[:, :] = jnp.ones((1, nb), jnp.int32)
    lrows_out[:, :] = jnp.full((1, nb), -1, jnp.int32)
    lhas_out[:, :] = jnp.zeros((1, nb), jnp.int32)
    pvals_out[:, :] = jnp.zeros((1, nb), jnp.int32)
    step_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)

    def step(t, _):
        col = Pt_out[pl.ds(t, 1), :]                    # (1, n)
        ispiv = ispiv_out[:, :]
        avail = jnp.logical_and(ispiv == 0, col != 0)
        availi = jnp.where(avail, jnp.int32(1), jnp.int32(0))
        has = jnp.max(availi, axis=1, keepdims=True)    # (1,1) 0/1
        hasb = has == 1
        r = jnp.min(jnp.where(avail, lane, jnp.int32(n)), axis=1,
                    keepdims=True)                      # (1,1) first avail
        at_r = lane == r                                # (1, n)
        pivval = jnp.sum(jnp.where(at_r, col, jnp.int32(0)), axis=1,
                         keepdims=True, dtype=jnp.int32)  # (1,1)
        c = _modinv32(pivval, p, invp)                  # (1,1)
        c = jnp.where(hasb, c, jnp.int32(1))
        # pivot row of the original panel = lane r of every sublane
        uraw = jnp.sum(jnp.where(at_r, Pt_out[:, :], jnp.int32(0)), axis=1,
                       keepdims=True, dtype=jnp.int32)    # (nb, 1)
        u = _reduce31(uraw * c, p, invp)
        u = jnp.where(hasb, u, jnp.int32(0))
        if rref:
            g = jnp.where(hasb, col, jnp.int32(0))
            g = jnp.where(at_r, jnp.where(hasb, pivval - jnp.int32(1), g), g)
        else:
            mask = jnp.logical_and(avail, jnp.logical_not(at_r))
            g = jnp.where(mask, col, jnp.int32(0))
        # P_t -= u (nb,1) x g (1,n); products <= (p/2)^2, sums < 2^31
        Pt_out[:, :] = _reduce31(Pt_out[:, :] - u * g, p, invp)
        G_out[pl.ds(t, 1), :] = g
        sel = step_iota == t                            # (1, nb)
        hasm = jnp.logical_and(sel, hasb)
        C_out[:, :] = jnp.where(sel, c, C_out[:, :])
        lrows_out[:, :] = jnp.where(
            hasm, r, jnp.where(sel, jnp.int32(-1), lrows_out[:, :]))
        lhas_out[:, :] = jnp.where(hasm, jnp.int32(1), lhas_out[:, :])
        pvals_out[:, :] = jnp.where(hasm, pivval, pvals_out[:, :])
        ispiv_out[:, :] = jnp.where(
            jnp.logical_and(at_r, hasb), jnp.int32(1), ispiv_out[:, :])
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), step, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("nb", "rref"))
def panel_sweep_small_p(Pt, ispiv, p32, nb: int, rref: bool):
    """Run the Mosaic sweep.  Pt: (nb, n) int32 transposed panel
    (n a multiple of 128); ispiv: (1, n) int32; p32: (1, 1) int32.

    Returns (Pt', G_t, C, lrows, lhas, pivvals, ispiv') — all int32;
    C holds balanced pivot inverses.

    Everything (including the prime) rides VMEM: the tunneled Mosaic
    compiler of this environment crashes on SMEM operands and on
    PrefetchScalarGridSpec.
    """
    n = Pt.shape[1]
    out_shapes = (
        jax.ShapeDtypeStruct((nb, n), jnp.int32),     # Pt'
        jax.ShapeDtypeStruct((nb, n), jnp.int32),     # G_t
        jax.ShapeDtypeStruct((1, nb), jnp.int32),     # C
        jax.ShapeDtypeStruct((1, nb), jnp.int32),     # lrows
        jax.ShapeDtypeStruct((1, nb), jnp.int32),     # lhas
        jax.ShapeDtypeStruct((1, nb), jnp.int32),     # pivvals
        jax.ShapeDtypeStruct((1, n), jnp.int32),      # ispiv'
    )
    kernel = functools.partial(_sweep_kernel, nb=nb, rref=rref)
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shapes),
    )(p32.reshape(1, 1), Pt, ispiv)
