"""Pallas panel kernel vs the XLA discovery/minor-solve path
(interpret mode on CPU keeps the kernel's semantics pinned regardless of
Mosaic availability)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spasm_tpu.dense.elim import (_discovery_sweep, _jordan_inverse,
                                  _forward_factor,
                                  _unit_upper_inverse_small)
from spasm_tpu.dense import sweep_pallas as sp


def _xla_reference(P0, p, rref):
    n, nb = P0.shape
    piv = _discovery_sweep(jnp.asarray(P0), jnp.zeros(n, bool),
                           jnp.int64(p), small=True, rounds=2)
    lrows = np.asarray(piv.lrows)
    lhas = np.asarray(piv.lhas)
    lsafe = np.where(lhas, lrows, 0)
    W = np.where(lhas[:, None] & lhas[None, :], P0[lsafe, :],
                 np.eye(nb, dtype=np.int32))
    if rref:
        Z = _jordan_inverse(jnp.asarray(W), jnp.int64(p), True, 2)
        return lrows, lhas, np.asarray(piv.is_piv), np.asarray(Z), None
    Zlu, Vup = _forward_factor(jnp.asarray(W), jnp.int64(p), True, 2)
    Vinv = _unit_upper_inverse_small(Vup, jnp.int64(p), True)
    return (lrows, lhas, np.asarray(piv.is_piv), np.asarray(Zlu),
            np.asarray(Vinv))


@pytest.mark.parametrize("p", [3, 257, 42013, 65279])
@pytest.mark.parametrize("rref", [True, False])
def test_pallas_panel_matches_xla(p, rref):
    rng = np.random.default_rng(p)
    n, nb = 256, 64
    P0 = rng.integers(-(p // 2), p // 2 + 1, (n, nb)).astype(np.int32)
    P0[:, 7] = P0[:, 2]          # duplicate column -> rank deficiency
    P0[:, 40] = 0                # empty column
    lrows, lhas, ispiv, Z, Vinv = _xla_reference(P0, p, rref)
    out = sp.panel_pivots_small_p(
        jnp.asarray(P0.T.copy()), jnp.zeros((1, n), jnp.int32),
        jnp.full((1, 1), p, jnp.int32), nb, rref, interpret=True)
    assert np.array_equal(np.asarray(out[0]).ravel(), lrows)
    assert np.array_equal(np.asarray(out[1]).ravel() == 1, lhas)
    assert np.array_equal(np.asarray(out[2]).ravel() == 1, ispiv)
    assert np.array_equal(np.asarray(out[3]), Z)
    if not rref:
        assert np.array_equal(np.asarray(out[4]), Vinv)


def test_pallas_prime_bound():
    # division-free updates need 2*(p//2)^2 < 2^31 at the advertised bound
    h = sp.PALLAS_MAX_PRIME // 2
    assert 2 * h * h + h < 2 ** 31
    # and the gate must stay inside the d == 2 digit tier
    from spasm_tpu.dense.modp import device_field
    assert device_field(sp.PALLAS_MAX_PRIME).ndigits == 2
