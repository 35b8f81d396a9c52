"""Mosaic substitution-sweep kernel: the reduced-basis build (phase A of
dense/reduced.py) as ONE streaming device program per row chunk.

Phase A computes R[k] = scatter(free entries of U row k)
                        - sum_j U[k, pivcol_j] * R[ref_j]
row by row in topological order.  The XLA scan formulation pays one
sequential scan step per topological *level* (~1000 levels on matching-
complex instances, 0.1-0.6 ms each — the measured top cost of the whole
finisher).  This kernel instead streams ROWS: for each row it issues
dynamic-row DMAs (HBM->VMEM) for its <= K referenced R rows plus its own
scatter row, combines them on the VPU with float32-reciprocal Barrett
reduction, and DMAs the result back — U rows in flight hide the DMA
latency, so the whole substitution runs at ~0.7 us/row regardless of the
level structure (measured 92k rows with random refs in 63 ms at
M = 22528).

Correctness of the pipeline: each iteration of the in-kernel loop first
waits for the previous iteration's write DMAs, then processes U rows.
The host schedule guarantees every row's references (and the previous
part of a split long row) sit >= U positions earlier, inserting inert
dead-row entries where the topological order packs dependent rows closer
(`plan_schedule`).  Chunk boundaries drain everything.

Layout: R rides as (npad, M // 128, 128) — the leading dim of a >= 3-D
memref is freely sliceable at row granularity, which the (2, 128)-tiled
2-D int16 layout is not.  Scope: the d == 2 digit tier (p <= 65279,
int16 storage); larger primes keep the XLA scan path.

Capability reference: replaces the backward substitution the reference
performs implicitly inside spasm_schur_dense
(/root/reference/src/spasm_schur.c:257-333) when eliminating against
earlier pivot rows; here it is the one-time compilation of the whole
pivot basis into the reduced operator R.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PL = True
except Exception:                        # pragma: no cover
    _HAVE_PL = False

SUBST_MAX_PRIME = 65279      # d == 2 digit tier (int16 storage)
_U = 8                       # rows in flight per in-kernel iteration
_S = 1024                    # rows per pallas call (SMEM budget ~40 KB)
_KMAX = 16                   # max refs per schedule entry (longer rows split)


def _reduce31(x, p, invp, rounds: int = 2):
    x = x.astype(jnp.int32)
    for _ in range(rounds):
        q = jnp.rint(x.astype(jnp.float32) * invp).astype(jnp.int32)
        x = x - q * p
    half = (p - jnp.int32(1)) >> jnp.int32(1)
    x = jnp.where(x > half, x - p, x)
    x = jnp.where(x < -half, x + p, x)
    return x.astype(jnp.int32)


def _subst_kernel(rowid_ref, refs_ref, coef_ref, p_ref, R_ref, out_ref,
                  *bufs, KR: int, nred: int, G: int):
    """One chunk of _S schedule entries; see module docstring.

    Scalar-prefetch refs: rowid (_S,), refs (_S*KR,) flat, coef
    (_S*KR,) flat (dead slots: refs -> npad-1, coef 0).  R (aliased
    in/out) lives in HBM as (npad, G, 128).
    """
    nb = _U * (KR + 1)
    gbufs = [bufs[s * (KR + 1):(s + 1) * (KR + 1)] for s in range(_U)]
    wbufs = bufs[nb:nb + _U]
    rsems = [bufs[nb + _U + s * (KR + 1):nb + _U + (s + 1) * (KR + 1)]
             for s in range(_U)]
    wsems = bufs[nb + _U + nb:nb + _U + nb + _U]
    p = p_ref[0]
    invp = jnp.float32(1.0) / p.astype(jnp.float32)
    npad1 = out_ref.shape[0] - 1

    def issue(i, slot):
        for k in range(KR):
            r = refs_ref[i * KR + k]

            @pl.when(r != npad1)
            def _():
                pltpu.make_async_copy(out_ref.at[pl.ds(r, 1)],
                                      gbufs[slot][k],
                                      rsems[slot][k]).start()
        pltpu.make_async_copy(out_ref.at[pl.ds(rowid_ref[i], 1)],
                              gbufs[slot][KR],
                              rsems[slot][KR]).start()

    def finish(i, slot):
        pltpu.make_async_copy(out_ref.at[pl.ds(0, 1)], gbufs[slot][KR],
                              rsems[slot][KR]).wait()
        acc = gbufs[slot][KR][0].astype(jnp.int32)
        for k0 in range(0, KR, nred):
            part = jnp.zeros((G, 128), jnp.int32)
            for k in range(k0, min(KR, k0 + nred)):
                r = refs_ref[i * KR + k]

                @pl.when(r != npad1)
                def _():
                    pltpu.make_async_copy(out_ref.at[pl.ds(0, 1)],
                                          gbufs[slot][k],
                                          rsems[slot][k]).wait()
                # dead slots carry coef 0 (plan_schedule), so the stale
                # buffer contents are multiplied away — no masking (a
                # jnp.where with a literal would promote to int64 under
                # jax_enable_x64, which Mosaic TC cannot lower)
                cz = coef_ref[i * KR + k]
                part = part + cz * gbufs[slot][k][0].astype(jnp.int32)
            acc = acc - _reduce31(part, p, invp)
        acc = _reduce31(acc, p, invp)
        wbufs[slot][0] = acc.astype(jnp.int16)
        pltpu.make_async_copy(wbufs[slot],
                              out_ref.at[pl.ds(rowid_ref[i], 1)],
                              wsems[slot]).start()

    def wait_writes():
        for s in range(_U):
            pltpu.make_async_copy(wbufs[s], out_ref.at[pl.ds(0, 1)],
                                  wsems[s]).wait()

    def body(j, _):
        @pl.when(j > 0)
        def _():
            wait_writes()
        for t in range(_U):
            issue(_U * j + t, t)
        for t in range(_U):
            finish(_U * j + t, t)
        return jnp.int32(0)

    # int32 bounds keep the index 32-bit under jax_enable_x64 (64-bit
    # scalar converts are not lowerable in Mosaic TC)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(_S // _U), body,
                      jnp.int32(0))
    wait_writes()


@functools.partial(jax.jit, static_argnames=("KR", "nred", "interpret"),
                   donate_argnums=(0,))
def _subst_call(R3, rowid, refs, coef, p32, KR: int, nred: int,
                interpret: bool = False):
    G = R3.shape[1]
    kfn = functools.partial(_subst_kernel, KR=KR, nred=nred, G=G)
    scratch = ([pltpu.VMEM((1, G, 128), jnp.int16)
                for _ in range(_U * (KR + 1) + _U)]
               + [pltpu.SemaphoreType.DMA(())
                  for _ in range(_U * (KR + 1) + _U)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kfn,
        out_shape=jax.ShapeDtypeStruct(R3.shape, R3.dtype),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(rowid, refs, coef, p32, R3)


def nred_for(p: int) -> int:
    """Products per int32 partial sum: nred * (p//2)^2 < 2^31 - p."""
    return max(1, min(_KMAX, ((1 << 31) - p) // max((p // 2) ** 2, 1)))


def plan_schedule(order: np.ndarray, ref_rows: np.ndarray,
                  ref_ptr: np.ndarray, ref_coef: np.ndarray,
                  npad: int) -> Optional[Tuple]:
    """Host scheduling: rows (given in topological processing order) ->
    padded entry arrays for the kernel.

    order: (n,) row ids in a valid processing order (each row's refs are
    earlier in `order` or not in it at all); ref_ptr (n+1,): CSR offsets
    into ref_rows/ref_coef listing each ORDERED row's references (R row
    ids) and coefficients.  Rows with more than _KMAX refs split into
    sequential entries chained through their own row.  Returns (rowid,
    refs, coef, KR) as (E,), (E, KR), (E, KR) padded arrays with E a
    multiple of _S, or None when there is nothing to process.
    """
    n = len(order)
    counts = np.diff(ref_ptr)
    live = counts > 0
    if not np.any(live):
        return None
    # split rows into parts of <= KR refs; later parts depend on their
    # own row (the previous part's write)
    KR = int(min(_KMAX, max(4, 1 << int(np.ceil(np.log2(
        min(counts.max(), _KMAX)))))))
    nparts = -(-counts[live] // KR)
    E0 = int(nparts.sum())
    rowid = np.empty(E0, np.int64)
    eref = np.full((E0, KR), npad - 1, np.int64)
    ecoef = np.zeros((E0, KR), np.int32)
    # entry e corresponds to (ordered row idx, part)
    row_of = np.repeat(np.nonzero(live)[0], nparts)
    part_of = _part_index(nparts)
    rowid[:] = order[row_of]
    starts = ref_ptr[row_of] + part_of * KR
    take = np.minimum(counts[row_of] - part_of * KR, KR)
    src = np.repeat(starts, take) + _part_index(take)
    dst_r = np.repeat(np.arange(E0), take)
    dst_c = _part_index(take)
    eref[dst_r, dst_c] = ref_rows[src]
    ecoef[dst_r, dst_c] = ref_coef[src]
    # dependency positions: refs that are themselves scheduled rows, plus
    # the same row's previous part.  A ref to a split row uses its LAST
    # part's position (only then is it fully computed).
    last_pos = np.full(npad, -(npad + _U), np.int64)
    np.maximum.at(last_pos, rowid, np.arange(E0))
    dep = last_pos[eref.reshape(-1)].reshape(E0, KR)
    dep[eref == npad - 1] = -(npad + _U)
    maxdep = dep.max(axis=1)
    prev_part = np.where(part_of > 0, np.arange(E0) - 1, -(npad + _U))
    maxdep = np.maximum(maxdep, prev_part)
    gap = np.arange(E0) - maxdep
    need = np.maximum(0, _U - gap)
    need[maxdep < 0] = 0
    pads_before = np.cumsum(need)
    E = E0 + int(pads_before[-1]) if E0 else 0
    Epad = -(-max(E, 1) // _S) * _S
    newpos = np.arange(E0) + pads_before
    rowid_f = np.full(Epad, npad - 1, np.int32)
    refs_f = np.full((Epad, KR), npad - 1, np.int32)
    coef_f = np.zeros((Epad, KR), np.int32)
    rowid_f[newpos] = rowid
    refs_f[newpos] = eref
    coef_f[newpos] = ecoef
    return rowid_f, refs_f, coef_f, KR


def _part_index(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    ends = np.cumsum(counts)
    return np.arange(total) - np.repeat(ends - counts, counts)


def run_schedule(R, rowid: np.ndarray, refs: np.ndarray,
                 coef: np.ndarray, KR: int, p: int,
                 interpret: bool = False):
    """Execute the schedule on device array R (npad, M) int16; returns
    the updated R (donated through the chunk chain)."""
    npad, M = R.shape
    G = M // 128
    R3 = R.reshape(npad, G, 128)
    p32 = jnp.asarray([p], np.int32)
    nred = nred_for(p)
    E = rowid.shape[0]
    for c0 in range(0, E, _S):
        R3 = _subst_call(R3,
                         jnp.asarray(rowid[c0:c0 + _S]),
                         jnp.asarray(refs[c0:c0 + _S].reshape(-1)),
                         jnp.asarray(coef[c0:c0 + _S].reshape(-1)),
                         p32, KR, nred, interpret)
    return R3.reshape(npad, M)


_SUBST_OK = None


def subst_available() -> bool:
    """True when the Mosaic substitution kernel compiles on this backend."""
    global _SUBST_OK
    if _SUBST_OK is None:
        try:
            if jax.default_backend() != "tpu" or not _HAVE_PL:
                _SUBST_OK = False
            else:
                R = jnp.zeros((64, 2048), jnp.int16)
                rowid = np.full(_S, 63, np.int32)
                refs = np.full((_S, 4), 63, np.int32)
                coef = np.zeros((_S, 4), np.int32)
                out = run_schedule(R, rowid, refs, coef, 4, 42013)
                jax.block_until_ready(out)
                _SUBST_OK = True
        except Exception:                # pragma: no cover
            _SUBST_OK = False
    return _SUBST_OK
