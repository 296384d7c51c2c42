"""Nested-dissection sparse LU: symbolic analysis, level-batched numeric
factorization, and the mesh-distributed variant.

Run: PYTHONPATH=.. python ex_sparse_nd_splu.py  (CPU; uses an 8-device
virtual mesh for the distributed part).
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from russell_tpu.parallel import make_mesh, dist_splu_factorize
from russell_tpu.sparse import samples
from russell_tpu.sparse import splu


def main():
    coo = samples.laplacian_2d(32)          # 1024 x 1024, 5-point stencil
    ii, jj, vv = map(np.asarray, coo.triplets())
    n = coo.nrow

    # symbolic: nested dissection -> wide elimination-tree levels
    plan = splu.splu_analyze(n, ii, jj, block_size=16, ordering="nd")
    print(f"n={n}: {plan.nb} block columns, {plan.nblk - 1} stored blocks, "
          f"{plan.lvl_cols.shape[0]} level chunks "
          f"(vs {plan.nb} sequential steps without the tree)")

    # numeric: level-batched inverse-based elimination (all GEMMs)
    fac = splu.splu_factorize(plan, jnp.asarray(vv))
    b = np.linspace(1.0, 2.0, n)
    x = splu.splu_solve(plan, fac, jnp.asarray(b))
    A = np.asarray(coo.as_dense())
    r = np.max(np.abs(A @ np.asarray(x) - b))
    print(f"single-chip residual: {r:.2e}   log|det| = "
          f"{float(fac['logdet']):.6f}")

    # distributed: level chunks split over an 8-device mesh (psum-combined
    # Schur updates) — same factorization, usable with the same solve
    mesh = make_mesh(8)
    fac_d = dist_splu_factorize(mesh, plan, jnp.asarray(vv))
    xd = splu.splu_solve(plan, fac_d, jnp.asarray(b))
    print(f"distributed == single-chip: "
          f"{np.max(np.abs(np.asarray(x) - np.asarray(xd))):.2e}")


if __name__ == "__main__":
    main()
