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

import os as _os

import jax as _jax

# The engine relies on int64 host/device scalars for exact arithmetic with
# p up to 2^32 - 5 (products reach 2^62).  XLA emulates s64 on TPU with
# 32-bit pairs; the hot inner loops use int8/int32 digit arithmetic instead.
_jax.config.update("jax_enable_x64", True)

def _enable_compile_cache():
    """Persistent XLA compile cache (all backends).

    The elimination kernels are heavy programs (minutes of XLA compile
    per shape bucket, measured on the TPU backend), so caching compiled
    executables across processes is essential: CLI tools and fresh
    benchmark runs would otherwise pay the full cold-compile cost every
    time.  Disable with SPASM_TPU_XLA_CACHE=0.
    """
    cache = _os.environ.get("SPASM_TPU_XLA_CACHE",
                            _os.path.expanduser("~/.cache/spasm_tpu_xla"))
    if cache == "0":
        return
    try:
        _os.makedirs(cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", cache)
        # persist EVERYTHING: through a remote-compile service even trivial
        # one-op programs cost 0.3-0.7 s to compile, and a cold
        # echelonize dispatches ~90 of them (measured 28 s of compile
        # wall on mk13.b5 with the 1.0 s threshold)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.0)
    except Exception:                                # pragma: no cover
        pass


_enable_compile_cache()


_WARMUP_THREAD = None


def warm_device_async():
    """Prime the device->host transfer channel in the background.

    On tunneled TPU deployments the FIRST device->host transfer of a
    process can pay a one-time channel handshake (measured: up to 230 s,
    independent of payload size; subsequent transfers run at full
    bandwidth).  The handshake blocks the *device* queue but not host
    work, so device-bound entry points (CLI tools, bench) call this
    before loading their input to overlap it with host-side parsing and
    the structural pivot search.  An atexit join prevents interpreter
    teardown while the handshake thread is mid-flight (for callers that
    end up never touching the device).  Idempotent; no-op with
    SPASM_TPU_NO_WARMUP=1.
    """
    global _WARMUP_THREAD
    if _WARMUP_THREAD is not None or _os.environ.get("SPASM_TPU_NO_WARMUP"):
        return _WARMUP_THREAD

    def _go():                                       # pragma: no cover
        try:
            import numpy as _np
            import jax.numpy as _jnp
            _np.asarray(_jnp.zeros(8, _jnp.int32))
        except Exception:
            pass

    import atexit
    import threading
    _WARMUP_THREAD = threading.Thread(target=_go, daemon=True,
                                      name="spasm-tpu-warmup")
    _WARMUP_THREAD.start()
    atexit.register(_WARMUP_THREAD.join)
    return _WARMUP_THREAD


__version__ = "0.1.0"

from .field import Field                                      # noqa: E402
from .csr import CSR, COO                                     # noqa: E402
from .hashing import PRNG, sha256_new                         # noqa: E402
from . import sio                                             # noqa: E402
from .echelonize import EchelonizeOptions, echelonize, LU     # noqa: E402
from .solve import solve, gesv                                # noqa: E402
from .kernel import kernel, kernel_from_rref                  # noqa: E402
from .rref import rref                                        # noqa: E402
from .certificate import (rank_certificate_create,            # noqa: E402
                          rank_certificate_verify,
                          factorization_verify,
                          certificate_save, certificate_load)
from .dm import dulmage_mendelsohn, strongly_connected_components  # noqa: E402
from .matching import maximum_matching, structural_rank       # noqa: E402

__all__ = [
    "Field", "CSR", "COO", "PRNG", "sha256_new", "sio",
    "EchelonizeOptions", "echelonize", "LU", "solve", "gesv",
    "kernel", "kernel_from_rref", "rref",
    "rank_certificate_create", "rank_certificate_verify",
    "factorization_verify", "certificate_save", "certificate_load",
    "dulmage_mendelsohn", "strongly_connected_components",
    "maximum_matching", "structural_rank",
]
