"""Multi-chip parallelism over a jax.sharding.Mesh.

The reference has NO distributed backend (SURVEY.md §2.9: MPI explicitly
disabled, interface_mumps.c:153); its concurrency is OpenMP-in-BLAS plus a
2-thread trick in Radau5. This module is the TPU-native answer that fills the
gap: meshes + shard_map + XLA collectives over ICI/DCN replace both the
missing MPI layer and OpenMP (SURVEY.md §5.8).

Provided here:
- ``make_mesh``: 1-D device mesh builder.
- ``dist_mat_vec_mul``: row-partitioned sparse mat-vec with the x-segments
  all-gathered over ICI (the moral analog of the halo exchange the reference
  *would* need for matrices too big for one host, SURVEY.md §5.7).
- ``batch_factor_solve``: many independent systems factorized/solved in
  data-parallel across the mesh — the TPU equivalent of the reference's
  user-level rayon parallelism (russell_ode/tests/test_multithreaded.rs, P6).
"""

from russell_tpu.parallel.mesh import make_mesh
from russell_tpu.parallel.dist_sparse import dist_mat_vec_mul, shard_csr_rows
from russell_tpu.parallel.batch import batch_factor_solve
from russell_tpu.parallel.multihost import (initialize_multihost,
                                            shard_banded_factorize,
                                            shard_banded_solve)
from russell_tpu.parallel.dist_splu import dist_splu_factorize
from russell_tpu.parallel.dist_gridmf import (dist_gridmf_factorize,
                                              dist_gridmf_solve)
from russell_tpu.parallel.dist_genmf import (dist_genmf_factorize,
                                             dist_genmf_solve)

__all__ = [
    "make_mesh",
    "dist_mat_vec_mul",
    "shard_csr_rows",
    "batch_factor_solve",
    "initialize_multihost",
    "shard_banded_factorize",
    "shard_banded_solve",
    "dist_splu_factorize",
    "dist_gridmf_factorize",
    "dist_gridmf_solve",
    "dist_genmf_factorize",
    "dist_genmf_solve",
]
