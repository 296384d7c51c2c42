"""Data-parallel batched solves over a device mesh (the TPU answer to the
reference's rayon multithreaded-solvers test)."""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import _prelude  # noqa: F401
import jax
import os as _os
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import jax.numpy as jnp
import numpy as np
from russell_tpu.parallel import batch_factor_solve, make_mesh
from russell_tpu.sparse import factor as _factor
from russell_tpu.sparse import samples
from russell_tpu.sparse.enums import Genie

mesh = make_mesh(min(8, len(jax.devices())))
coo = samples.laplacian_2d(12)
ii, jj, vv = coo.triplets()
plan = _factor.analyze(coo.nrow, ii, jj, genie=Genie.BANDED)
B = 2 * mesh.devices.size
scale = 1.0 + 0.1 * jnp.arange(B)[:, None]
bvals = jnp.tile(jnp.asarray(vv)[None, :], (B, 1)) * scale
brhs = jnp.tile(jnp.linspace(1.0, 2.0, coo.nrow)[None, :], (B, 1))
X = batch_factor_solve(mesh, plan, bvals, brhs)
A = coo.as_dense()
for i in (0, B - 1):
    r = np.max(np.abs(float(scale[i, 0]) * A @ np.asarray(X[i]) -
                      np.asarray(brhs[i])))
    print(f"batch {i}: residual = {r:.2e}")
    assert r < 1e-10
print(f"solved {B} systems across {mesh.devices.size} devices; ok")
