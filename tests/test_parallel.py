"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax

from spasm_tpu.field import Field
from spasm_tpu.parallel.dist import make_mesh
from spasm_tpu.dense.elim import dense_rref


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.devices.size == 8
    assert set(mesh.axis_names) == {"rows", "cols"}


def test_device_finisher_on_mesh_matches(mesh):
    """The device-resident dense finisher (combination forming, chunked
    elimination, compaction, row-sweep RREF) under an active mesh gives
    the same rank as the single-device run."""
    from spasm_tpu.csr import COO
    from spasm_tpu.echelonize import echelonize, EchelonizeOptions
    from spasm_tpu.parallel.context import use_mesh
    p = 42013
    rng = np.random.default_rng(3)
    n = m = 256
    rows = np.repeat(np.arange(n), 4)
    cols = rng.integers(0, m, n * 4)
    vals = rng.integers(1, p, n * 4)
    T = COO.from_entries(n, m, p, rows, cols, vals)
    T.n, T.m = n, m
    A = T.tocsr()
    opts = EchelonizeOptions(device_dense_min=0)   # force the finisher
    ref = echelonize(A.copy(), opts).r
    with use_mesh(mesh):
        got = echelonize(A.copy(), opts).r
    assert got == ref


def test_echelonize_on_mesh_matches(mesh, matrix_dir):
    """End-to-end engine run under an active mesh: every device stage is
    sharded (row-sharded block elimination, column-sharded dense RREF);
    U and the rank must be bit-identical to the single-device run."""
    from spasm_tpu import sio
    from spasm_tpu.echelonize import echelonize
    from spasm_tpu.parallel.context import use_mesh
    A, _ = sio.load_csr(matrix_dir / "mat364.sms", 42013)
    ref = echelonize(A.copy())
    U_ref = ref.U
    with use_mesh(mesh):
        fact = echelonize(A.copy())
        U = fact.U
    assert fact.r == ref.r
    assert np.array_equal(fact.qinv, ref.qinv)
    assert np.array_equal(U.indptr, U_ref.indptr)
    assert np.array_equal(U.indices, U_ref.indices)
    assert np.array_equal(U.data, U_ref.data)


def test_echelonize_on_mesh_with_L(mesh, matrix_dir):
    """Complete PLUQ on the mesh: A == L @ U."""
    from spasm_tpu import sio
    from spasm_tpu.echelonize import echelonize, EchelonizeOptions
    from spasm_tpu.parallel.context import use_mesh
    A, _ = sio.load_csr(matrix_dir / "singular.sms", 257)
    with use_mesh(mesh):
        fact = echelonize(A.copy(), EchelonizeOptions(complete=True))
    F = A.field
    got = F.narray(fact.L.todense().astype(object)
                   @ fact.U.todense().astype(object))
    assert np.array_equal(got, A.todense())


def test_sharded_dense_rref_matches(mesh):
    """Column-sharded blocked RREF over the mesh == single-device RREF
    (2-D dense elimination with SPMD-inserted panel gathers)."""
    from spasm_tpu.parallel.context import use_mesh
    p = 42013
    rng = np.random.default_rng(7)
    n = m = 1024
    S = rng.integers(-p // 2, p // 2 + 1, (n, m)).astype(np.int32)
    # plant rank deficiency: 32 duplicate rows
    S[512:544] = S[0:32]
    want_R, want_piv = dense_rref(S, p, force="device")
    with use_mesh(mesh):
        got_R, got_piv = dense_rref(S, p, force="device")
    assert np.array_equal(want_piv, got_piv)
    assert np.array_equal(want_R, got_R)


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
