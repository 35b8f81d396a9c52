"""Substitution-sweep kernel (dense/subst_pallas.py): host schedule
invariants, and kernel semantics pinned in interpret mode on CPU (the
Mosaic build runs only on TPU; interpret mode keeps the DMA/combine
logic covered regardless)."""
import numpy as np
import pytest

import jax.numpy as jnp

from spasm_tpu.dense.subst_pallas import (plan_schedule, run_schedule,
                                          nred_for, _S, _U)


def _random_dag(rng, n, max_refs):
    """Rows 0..n-1 in processing order; row i refs only rows < i."""
    ref_rows, ref_ptr = [], [0]
    for i in range(n):
        k = int(rng.integers(0, max_refs + 1)) if i else 0
        k = min(k, i)
        refs = rng.choice(i, size=k, replace=False) if k else []
        ref_rows.extend(int(r) for r in refs)
        ref_ptr.append(len(ref_rows))
    return np.asarray(ref_rows, np.int64), np.asarray(ref_ptr, np.int64)


def test_plan_schedule_invariants():
    rng = np.random.default_rng(0)
    n, npad = 500, 576
    ref_rows, ref_ptr = _random_dag(rng, n, 6)
    coef = rng.integers(-1000, 1000, ref_rows.size).astype(np.int32)
    order = np.arange(n, dtype=np.int64)
    plan = plan_schedule(order, ref_rows, ref_ptr, coef, npad)
    assert plan is not None
    rowid, refs, cf, KR = plan
    E = rowid.shape[0]
    assert E % _S == 0
    assert rowid.min() >= 0 and rowid.max() <= npad - 1
    assert refs.min() >= 0 and refs.max() <= npad - 1
    # distance invariant: every live ref (and the same row's previous
    # part) sits >= _U entries earlier
    last = np.full(npad, -(10 ** 9), np.int64)
    for e in range(E):
        for k in range(KR):
            r = refs[e, k]
            if r != npad - 1:
                assert last[r] < 0 or e - last[r] >= _U
        if rowid[e] != npad - 1:
            assert last[rowid[e]] < 0 or e - last[rowid[e]] >= _U
            last[rowid[e]] = e


def test_plan_schedule_splits_long_rows():
    rng = np.random.default_rng(1)
    npad = 128
    n = 3
    # row 2 with 40 refs -> split into ceil(40/KR) parts
    ref_rows = np.concatenate([np.zeros(0, np.int64),
                               np.zeros(0, np.int64),
                               rng.choice(2, 40, replace=True)])
    ref_ptr = np.asarray([0, 0, 0, 40], np.int64)
    coef = rng.integers(1, 100, 40).astype(np.int32)
    plan = plan_schedule(np.arange(n, dtype=np.int64), ref_rows, ref_ptr,
                         coef, npad)
    rowid, refs, cf, KR = plan
    parts = int((rowid == 2).sum())
    assert parts == -(-40 // KR)


@pytest.mark.parametrize("p", [257, 42013, 65279])
def test_kernel_interpret_matches_host(p):
    rng = np.random.default_rng(p)
    npad, M = 128, 2048
    n = 60
    ref_rows, ref_ptr = _random_dag(rng, n, 4)
    coef = rng.integers(-(p // 2), p // 2 + 1,
                        ref_rows.size).astype(np.int32)
    order = np.arange(n, dtype=np.int64)
    plan = plan_schedule(order, ref_rows, ref_ptr, coef, npad)
    assert plan is not None
    rowid, refs, cf, KR = plan
    R0 = rng.integers(-(p // 2), p // 2 + 1, (npad, M)).astype(np.int16)
    R0[npad - 1] = 0
    out = np.asarray(run_schedule(jnp.asarray(R0), rowid, refs, cf, KR,
                                  p, interpret=True))
    # host model: sequential substitution in order
    exp = R0.astype(np.int64).copy()
    for i in range(n):
        acc = exp[i].copy()
        for s in range(ref_ptr[i], ref_ptr[i + 1]):
            acc = acc - int(coef[s]) * exp[ref_rows[s]]
        v = acc % p
        v = np.where(v > p // 2, v - p, v)
        exp[i] = v
    assert np.array_equal(out.astype(np.int64), exp)


def test_nred_bounds():
    for p in (3, 257, 42013, 65279):
        nred = nred_for(p)
        assert nred >= 1
        assert nred * (p // 2) ** 2 < (1 << 31) - p
