"""Multi-chip execution: jax.sharding.Mesh partitions of the dense
elimination paths.

The reference's only parallelism is single-node OpenMP (SURVEY.md §2.4);
here the same row-parallel regions become SPMD device programs:

  * data-parallel axis "rows": independent row blocks of X eliminated
    against a replicated chunk basis (the analog of `omp for` over rows in
    spasm_schur.c:95-96);
  * tensor-parallel axis "cols": the trailing-update matmuls of the dense
    elimination are sharded over columns, with pivot/factor panels
    broadcast via all_gather (the analog of FFPACK's internal threading);
  * reductions (rank counts, completion tests) ride psum.
"""

from .dist import make_mesh, shard_rows, replicate              # noqa: F401
from .context import use_mesh, current_mesh                     # noqa: F401
