"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax

from spasm_tpu.field import Field
from spasm_tpu.parallel.dist import (make_mesh, distributed_round_step,
                                     distributed_block_eliminate)
from spasm_tpu.dense.block import UEliminator
from spasm_tpu.dense.elim import dense_rref


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.devices.size == 8
    assert set(mesh.axis_names) == {"rows", "cols"}


def test_distributed_round_matches_single(mesh):
    p = 42013
    rng = np.random.default_rng(0)
    S = rng.integers(-p // 2, p // 2 + 1, (64, 128)).astype(np.int32)
    S2, cnt = distributed_round_step(mesh, S, p, nb=64)
    # the first panel of a full-rank random matrix yields 64 pivots
    assert cnt == 64
    # compare against the single-device elimination of the same panel:
    # pivots of the first 64 columns must match the RREF rank profile
    R, pivcols = dense_rref(S, p, force="host")
    assert np.all(pivcols[:cnt] == np.arange(64))


def test_distributed_block_eliminate_matches(mesh):
    p = 65537
    rng = np.random.default_rng(1)
    m = 256
    elim = UEliminator(m, p)
    F = Field(p)
    rows = []
    for k in range(32):
        cols = np.asarray(sorted({k, (3 * k + 7) % m, (5 * k + 11) % m}),
                          np.int64)
        vals = F.narray(rng.integers(1, p, cols.size))
        vals[np.searchsorted(cols, k)] = 1      # unit pivot at column k
        rows.append((cols, vals.astype(np.int32), k))
    elim.append_rows(rows)
    X = rng.integers(-p // 2, p // 2 + 1, (16, m)).astype(np.int32)
    want = elim.eliminate(X.copy())
    got = distributed_block_eliminate(mesh, X.copy(), elim)
    assert np.array_equal(got, want)


def test_graft_entry_compiles():
    import importlib.util
    import pathlib
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = fn(*args)
    assert out[0].shape == (256, 512)
    if len(jax.devices()) >= 8:
        mod.dryrun_multichip(8)
