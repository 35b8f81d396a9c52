"""spasm_tpu — TPU-native exact sparse linear algebra over GF(p).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SpaSM
(cbouilla/spasm, reference v1.3): multithreaded sparse row-echelonization
modulo an odd prime p <= 2^32 - 5, and everything derived from it — rank,
row-space basis, kernel basis, RREF, full PLUQ factorization, linear-system
solving, rank certificates, Dulmage-Mendelsohn decomposition and strongly
connected components.

Architecture (TPU-first, not a port):
  * host side: CSR/COO containers, I/O (SMS / MatrixMarket with SHA-256
    fingerprints), symbolic graph passes (reach, pivot search, matching,
    DM, SCC) — irregular pointer-chasing that has no business on an MXU.
  * device side (JAX/XLA/Pallas): dense mod-p arithmetic — digit-decomposed
    MXU matmuls, blocked rank-revealing RREF/PLUQ (replaces the reference's
    FFLAS-FFPACK bridge, /root/reference/src/spasm_ffpack.cpp), and chunked
    topological elimination of dense row blocks against U (replaces the
    per-row Gilbert-Peierls solves of /root/reference/src/spasm_schur.c).
  * multi-chip: jax.sharding.Mesh + shard_map row/column partitions of the
    dense elimination path (replaces OpenMP, which is the reference's only
    parallelism).

Numbers are stored in the *balanced* representation x in [-(p-1)/2, (p-1)/2]
as int32, exactly like the reference (spasm.h:28, spasm_ZZp.c:17-24), so
artifacts (SMS files, certificates, PRNG streams) interoperate bit-for-bit.
"""

import jax as _jax

# The engine relies on int64 host/device scalars for exact arithmetic with
# p up to 2^32 - 5 (products reach 2^62).  XLA emulates s64 on TPU with
# 32-bit pairs; the hot inner loops use int8/int32 digit arithmetic instead.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .field import Field                                      # noqa: E402
from .csr import CSR, COO                                     # noqa: E402
from .hashing import PRNG, sha256_new                         # noqa: E402
from . import sio                                             # noqa: E402

__all__ = ["Field", "CSR", "COO", "PRNG", "sha256_new", "sio"]
