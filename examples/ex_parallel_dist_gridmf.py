"""Distributed GRIDMF multifrontal factorization over a device mesh:
the congruent-front node axis is sharded blockwise, so children stay on
their parent's shard and the extend-add is traffic-free until the top
log2(n_devices) depths (the MUMPS MPI subtree-ownership role expressed
purely through jax.sharding annotations — XLA inserts the collectives).
Runs on a virtual 8-device CPU mesh; the same code drives a TPU pod."""
import os as _os
_os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import _prelude  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp
from russell_tpu.parallel import (dist_gridmf_factorize, dist_gridmf_solve,
                                  make_mesh)
from russell_tpu.sparse import samples
from russell_tpu.sparse import gridmf as _gridmf

ndev = len(jax.devices())
mesh = make_mesh(ndev)
print("mesh:", mesh)

coo = samples.laplacian_2d(32)
ii, jj, vv = coo.triplets()
plan = _gridmf.gridmf_analyze(coo.nrow, np.asarray(ii), np.asarray(jj),
                              (32, 32, 1), leaf_cells=4)
print("levels:", len(plan.levels),
      "leaf fronts:", plan.levels[-1].n_nodes)

vals = jnp.asarray(vv)
fac = dist_gridmf_factorize(mesh, plan, vals)
rhs = jnp.asarray(np.linspace(1.0, 2.0, coo.nrow))
x = dist_gridmf_solve(mesh, plan, fac, rhs)

r = np.asarray(coo.as_dense()) @ np.asarray(x) - np.asarray(rhs)
print("max |Ax-b| =", np.max(np.abs(r)))
assert np.max(np.abs(r)) < 1e-9

# the sharded result matches the single-device factorization bit-for-bit
# up to GEMM reassociation inside a shard
fac1 = jax.jit(lambda d: _gridmf.gridmf_factorize(plan, d))(vals)
x1 = jax.jit(lambda f, b: _gridmf.gridmf_solve(plan, f, b))(fac1, rhs)
assert np.max(np.abs(np.asarray(x) - np.asarray(x1))) < 1e-10
print("distributed gridmf OK")
