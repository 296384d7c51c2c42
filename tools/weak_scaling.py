"""Weak-scaling harness: distributed SpMV + distributed SPLU over growing
device meshes (BASELINE.json: nnz/s efficiency at 1 chip / 1 host / N hosts).

On real hardware run one process per host (russell_tpu.parallel.
initialize_multihost) and let the mesh span all chips. Without a pod this
script demonstrates the same code path on a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python tools/weak_scaling.py

Prints one JSON line per (kernel, ndev) with nnz/s and the efficiency
relative to the smallest mesh (weak scaling: the problem grows with the
mesh, so perfect scaling keeps nnz/s per device constant).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def bench_spmv(ndev, base_points):
    from russell_tpu.parallel import make_mesh, shard_csr_rows, \
        dist_mat_vec_mul
    from russell_tpu.sparse import CsrMatrix, samples

    npts = int(base_points * np.sqrt(ndev))
    coo = samples.laplacian_2d(npts)
    csr = CsrMatrix.from_coo(coo)
    mesh = make_mesh(ndev)
    sh = shard_csr_rows(csr, ndev)
    x = jnp.ones(sh.n_pad, dtype=jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh, P("rows")))
    fn = jax.jit(lambda v: dist_mat_vec_mul(mesh, sh, v))
    fn(x).block_until_ready()
    reps = 5
    t = time.perf_counter()
    for _ in range(reps):
        y = fn(x)
    y.block_until_ready()
    dt = (time.perf_counter() - t) / reps
    return coo.nnz / dt, coo.nnz


def bench_splu(ndev, base_points):
    from russell_tpu.parallel import make_mesh, dist_splu_factorize
    from russell_tpu.sparse import samples
    from russell_tpu.sparse import splu as S

    npts = int(base_points * np.sqrt(ndev))
    coo = samples.laplacian_2d(npts)
    ii, jj, vv = map(np.asarray, coo.triplets())
    plan = S.splu_analyze(coo.nrow, ii, jj, block_size=16, ordering="nd")
    mesh = make_mesh(ndev)
    fn = jax.jit(lambda d: dist_splu_factorize(mesh, plan, d)["blocks"])
    d = jnp.asarray(vv, dtype=jnp.float32)
    fn(d).block_until_ready()
    reps = 2
    t = time.perf_counter()
    for _ in range(reps):
        b = fn(d)
    b.block_until_ready()
    dt = (time.perf_counter() - t) / reps
    return coo.nnz / dt, coo.nnz


def bench_gridmf(ndev, base_points):
    from russell_tpu.parallel import make_mesh, dist_gridmf_factorize
    from russell_tpu.sparse import samples
    from russell_tpu.sparse import gridmf as G

    npts = int(base_points * np.sqrt(ndev))
    coo = samples.laplacian_2d(npts)
    ii, jj, vv = map(np.asarray, coo.triplets())
    plan = G.gridmf_analyze(coo.nrow, ii, jj, (npts, npts, 1),
                            leaf_cells=16)
    mesh = make_mesh(ndev)
    d = jnp.asarray(vv, dtype=jnp.float32)
    dist_gridmf_factorize(mesh, plan, d)["logdet"].block_until_ready()
    reps = 3
    t = time.perf_counter()
    for _ in range(reps):
        f = dist_gridmf_factorize(mesh, plan, d)
    f["logdet"].block_until_ready()
    dt = (time.perf_counter() - t) / reps
    return coo.nnz / dt, coo.nnz


def main():
    ndevs = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    for name, bench, base in (("dist_spmv", bench_spmv, 64),
                              ("dist_splu_factorize", bench_splu, 24),
                              ("dist_gridmf_factorize", bench_gridmf, 64)):
        base_rate = None
        for nd in ndevs:
            rate, nnz = bench(nd, base)
            if base_rate is None:
                base_rate = rate
            eff = rate / (base_rate * nd / ndevs[0])
            print(json.dumps({
                "kernel": name, "ndev": nd, "nnz": int(nnz),
                "nnz_per_s": round(rate, 1),
                "weak_scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
