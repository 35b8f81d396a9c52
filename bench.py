"""Benchmark driver: echelonization throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: rank of a deterministic synthetic sparse matrix over GF(42013)
(random pattern, ~8 nnz/row) — the same regime as the reference's
headline benchmarks (hpac.imag.fr GL7d / kneser matrices, README.md:68-91,
which are not redistributable in-repo).  Structural pivots eliminate part
of the rows arithmetic-free; the residual Schur complement densifies and
flows through the device elimination kernels.

vs_baseline anchor: the reference computes the rank of kneser_10_4_1
(1,036,800 x 1,731,721 ~ 1.6M nnz) in "a few seconds" on an unspecified
multicore (README.md:68-71).  We take 3 s => ~5.5e5 nnz/s as the
reference throughput; vs_baseline = ours / 5.5e5.
"""
import json
import sys
import time

import numpy as np

REFERENCE_NNZ_PER_S = 5.5e5


def synthetic_matrix(n, m, w, p, seed=12345):
    from spasm_tpu.csr import COO
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), w)
    cols = rng.integers(0, m, size=n * w)
    vals = rng.integers(1, p, size=n * w)
    T = COO.from_entries(n, m, p, rows, cols, vals)
    T.n, T.m = n, m
    return T.tocsr()


def main():
    import logging

    from spasm_tpu import echelonize
    logging.getLogger("spasm_tpu").setLevel(logging.WARNING)

    n = m = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    p = 42013
    A = synthetic_matrix(n, m, 8, p)
    nnz = A.nnz

    # warm run: compiles every kernel variant of this exact workload
    # (one-time cost, amortized in production; the reference has no
    # equivalent cost but also no compiled device kernels)
    echelonize(A.copy())

    t0 = time.time()
    fact = echelonize(A)
    wall = time.time() - t0

    value = nnz / wall
    out = {
        "metric": "echelonize_nnz_per_s",
        "value": round(value, 1),
        "unit": "nnz/s",
        "vs_baseline": round(value / REFERENCE_NNZ_PER_S, 3),
        "detail": {"n": n, "m": m, "nnz": int(nnz), "rank": int(fact.r),
                   "wall_s": round(wall, 2), "prime": p},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
