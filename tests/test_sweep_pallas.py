"""Pallas panel-sweep kernel vs the XLA sweep (interpret mode on CPU).

The compiled kernel is gated behind SPASM_TPU_PALLAS_SWEEP (the tunneled
Mosaic compiler of the dev environment is unreliable); interpret mode
keeps the kernel's semantics pinned to the XLA reference regardless.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spasm_tpu.dense.elim import _panel_sweep
from spasm_tpu.dense import sweep_pallas as sp


def run_interpret(Pt, ispiv, p, nb, rref):
    kernel = functools.partial(sp._sweep_kernel, nb=nb, rref=rref)
    n = Pt.shape[1]
    out_shapes = (
        jax.ShapeDtypeStruct((nb, n), jnp.int32),
        jax.ShapeDtypeStruct((nb, n), jnp.int32),
        jax.ShapeDtypeStruct((1, nb), jnp.int32),
        jax.ShapeDtypeStruct((1, nb), jnp.int32),
        jax.ShapeDtypeStruct((1, nb), jnp.int32),
        jax.ShapeDtypeStruct((1, nb), jnp.int32),
        jax.ShapeDtypeStruct((1, n), jnp.int32),
    )
    return pl.pallas_call(
        kernel, out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shapes),
        interpret=True,
    )(jnp.asarray([[p]], jnp.int32), Pt, ispiv)


@pytest.mark.parametrize("p", [3, 257, 42013, 65537, 92681])
@pytest.mark.parametrize("rref", [True, False])
def test_pallas_sweep_matches_xla(p, rref):
    rng = np.random.default_rng(p)
    n, nb = 256, 64
    P0 = rng.integers(-(p // 2), p // 2 + 1, (n, nb)).astype(np.int32)
    P0[:, 7] = P0[:, 2]          # duplicate column -> rank deficiency
    P0[:, 40] = 0                # empty column
    ref = _panel_sweep(jnp.asarray(P0), jnp.asarray(np.zeros(n, bool)),
                       jnp.int64(p), rref, 2)
    out = run_interpret(jnp.asarray(P0.T.copy()),
                        jnp.asarray(np.zeros((1, n), np.int32)), p, nb, rref)
    Pt2, Gt, C, lrows, lhas, pvals, ispiv2 = [np.asarray(o) for o in out]
    assert np.array_equal(Pt2.T, np.asarray(ref.P))
    assert np.array_equal(Gt.T, np.asarray(ref.G))
    assert np.array_equal(C.ravel().astype(np.int64) % p,
                          np.asarray(ref.C) % p)
    assert np.array_equal(lrows.ravel(), np.asarray(ref.lrows))
    assert np.array_equal(lhas.ravel() == 1, np.asarray(ref.lhas))
    assert np.array_equal(pvals.ravel(), np.asarray(ref.pivvals))
    assert np.array_equal(ispiv2.ravel() == 1, np.asarray(ref.is_piv))


def test_pallas_prime_bound():
    # (p//2)^2 + p//2 must stay below 2^31 at the advertised bound
    h = sp.PALLAS_MAX_PRIME // 2
    assert h * h + h < 2 ** 31
