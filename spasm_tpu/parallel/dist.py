"""Mesh-sharded dense elimination (dp rows x tp cols).

Everything here is plain jit-with-shardings: the kernels from
spasm_tpu.dense are annotated with NamedSharding constraints and XLA's
SPMD partitioner inserts the collectives (all_gather of factor panels
along the column axis, psum for rank reductions) — the scaling-book
recipe: pick a mesh, annotate, let XLA place collectives on ICI.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dense.modp import matmul_digits, dnorm, device_field
from ..dense.elim import _panel_step


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    """A ('rows', 'cols') mesh over the available devices.

    The factorization puts more devices on 'rows' (the data-parallel
    axis, which scales with the matrix) than on 'cols'.
    """
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    rows = n
    cols = 1
    while rows % 2 == 0 and cols < rows // 2:
        rows //= 2
        cols *= 2
    return Mesh(np.asarray(devices).reshape(rows, cols), ("rows", "cols"))


def shard_rows(mesh: Mesh, X):
    return jax.device_put(X, NamedSharding(mesh, P("rows", None)))


def shard_cols(mesh: Mesh, X):
    return jax.device_put(X, NamedSharding(mesh, P(None, "cols")))


def replicate(mesh: Mesh, X):
    return jax.device_put(X, NamedSharding(mesh, P()))


@functools.partial(jax.jit, static_argnames=("d",))
def _apply_chunk_sharded(X, cols, jpos, V, p, weights, d: int):
    """Chunk elimination on a row-sharded block (pure dp — no
    cross-device communication; the chunk basis V is replicated)."""
    Xc = X[:, cols]
    F = Xc[:, jpos]
    delta = matmul_digits(F, V, p, weights, d)
    Xc = dnorm(Xc.astype(jnp.int64) - delta.astype(jnp.int64), p)
    Xc = Xc.at[:, jpos].set(F)
    return X.at[:, cols].set(Xc)


def distributed_block_eliminate(mesh: Mesh, X: np.ndarray, eliminator
                                ) -> np.ndarray:
    """Row-sharded version of UEliminator.eliminate: each device holds a
    slice of the rows of X; chunk bases are replicated."""
    eliminator.flush()
    if not eliminator.runs:
        return X
    from ..dense.elim import _size_bucket
    B, m = X.shape
    rows_ax = mesh.shape["rows"] * mesh.shape["cols"]
    Bp = max(_size_bucket(B, 8), rows_ax)
    Bp = -(-Bp // rows_ax) * rows_ax
    mp = _size_bucket(m + 1, 64)
    Xp = np.zeros((Bp, mp), np.int32)
    Xp[:B, :m] = X
    flat_mesh = Mesh(np.asarray(mesh.devices).reshape(-1, 1),
                     ("rows", "cols"))
    Xd = jax.device_put(Xp, NamedSharding(flat_mesh, P("rows", None)))
    p64 = jnp.int64(eliminator.p)
    w = jnp.asarray(eliminator.F.weights)
    for run in eliminator.runs:
        for g in range(run.V.shape[0]):
            Xd = _apply_chunk_sharded(
                Xd, jax.device_put(run.cols[g],
                                   NamedSharding(flat_mesh, P())),
                jax.device_put(run.jpos[g],
                               NamedSharding(flat_mesh, P())),
                jax.device_put(run.V[g], NamedSharding(flat_mesh, P())),
                p64, w, eliminator.F.ndigits)
    return np.asarray(Xd)[:B, :eliminator.m]


@functools.partial(jax.jit, static_argnames=("d", "nb"),
                   donate_argnums=(0,))
def _round_step(S, p, weights, d: int, nb: int):
    """One dense-elimination round on a 2-D sharded matrix:

      * panel sweep on the (replicated) leading panel;
      * composed trailing update as a column-sharded MXU matmul;
      * rank contribution via the pivot mask (psum by XLA).

    S: (n, m) int32 balanced, sharded P('rows', 'cols') by the caller's
    in_shardings; returns (S', pivot_count).
    """
    n, m = S.shape
    # the panel step gathers the leading panel (all_gather along 'cols'
    # inserted by SPMD) and applies the trailing update as sharded matmuls
    S, _, lhas, _, _ = _panel_step(
        S, jnp.int64(0), jnp.zeros((n,), bool),
        jnp.zeros((n, 1), jnp.int32), p, weights, d, nb,
        rref=True, small=(d == 2), rounds=2)
    return S, jnp.sum(lhas.astype(jnp.int32))


def distributed_round_step(mesh: Mesh, S: np.ndarray, p: int,
                           nb: int = 64):
    """Run one sharded elimination round over the mesh.

    S is placed P('rows', 'cols'); XLA partitions the trailing matmuls
    over both axes and inserts the panel broadcasts.
    """
    F = device_field(p)
    Sd = jax.device_put(jnp.asarray(S),
                        NamedSharding(mesh, P("rows", "cols")))
    S2, cnt = _round_step(Sd, jnp.int64(p), jnp.asarray(F.weights),
                          F.ndigits, nb)
    return S2, int(cnt)
