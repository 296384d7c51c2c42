"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from russell_tpu.parallel import (batch_factor_solve, dist_mat_vec_mul,
                                  make_mesh, shard_banded_factorize,
                                  shard_banded_solve, shard_csr_rows)
from russell_tpu.sparse import CsrMatrix
from russell_tpu.sparse import factor as _factor
from russell_tpu.sparse import samples
from russell_tpu.sparse.enums import Genie


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(min(8, len(jax.devices())))


def test_dist_spmv(mesh):
    coo = samples.laplacian_2d(10)
    csr = CsrMatrix.from_coo(coo)
    sh = shard_csr_rows(csr, mesh.devices.size)
    x = np.sin(np.arange(sh.n_pad, dtype=np.float64))
    y = np.asarray(jax.jit(lambda v: dist_mat_vec_mul(mesh, sh, v))(
        jnp.asarray(x)))
    ref = coo.as_dense() @ x[: sh.n]
    np.testing.assert_allclose(y[: sh.n], ref, atol=1e-12)


def test_batch_factor_solve(mesh):
    coo = samples.laplacian_2d(8)
    ii, jj, vv = coo.triplets()
    plan = _factor.analyze(coo.nrow, ii, jj, genie=Genie.BANDED)
    B = 2 * mesh.devices.size
    scale = 1.0 + 0.25 * jnp.arange(B)[:, None]
    bvals = jnp.tile(jnp.asarray(vv)[None, :], (B, 1)) * scale
    brhs = jnp.tile(jnp.linspace(1.0, 2.0, coo.nrow)[None, :], (B, 1))
    X = batch_factor_solve(mesh, plan, bvals, brhs)
    A = coo.as_dense()
    for i in (0, B // 2, B - 1):
        r = np.max(np.abs(float(scale[i, 0]) * A @ np.asarray(X[i])
                          - np.asarray(brhs[i])))
        assert r < 1e-10


def test_distributed_bcr_factorization(mesh):
    # the block axis of the BCR factorization sharded over the mesh
    coo = samples.laplacian_2d(40)   # nb large enough to shard
    ii, jj, vv = coo.triplets()
    plan = _factor.analyze(coo.nrow, ii, jj, genie=Genie.BANDED,
                           banded_kernel="bcr")
    fac = shard_banded_factorize(mesh, plan, vv)
    rhs = np.linspace(1.0, 2.0, coo.nrow)
    x = np.asarray(shard_banded_solve(mesh, plan, fac, jnp.asarray(rhs)))
    resid = np.max(np.abs(coo.as_dense() @ x - rhs))
    assert resid < 1e-10


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_dist_splu_factorize_matches_single_chip(dtype):
    # pair-sharded distributed SPLU == single-chip factorization; the
    # f32 case tracks the driver's dryrun contract (absolute residual
    # 1e-3, no refinement) — the configuration that caught the round-1
    # delta-add poisoning
    import jax.numpy as jnp
    from russell_tpu.parallel import make_mesh, dist_splu_factorize
    from russell_tpu.sparse import samples as _samples
    from russell_tpu.sparse import splu as _splu

    coo = _samples.laplacian_2d(16)
    ii, jj, vv = map(np.asarray, coo.triplets())
    n = coo.nrow
    plan = _splu.splu_analyze(n, ii, jj, block_size=16, ordering="nd")
    mesh = make_mesh(8)
    fac_d = dist_splu_factorize(mesh, plan, jnp.asarray(vv, dtype=dtype))
    fac_s = _splu.splu_factorize(plan, jnp.asarray(vv, dtype=dtype))
    # the sharded pair sums only reassociate float addition: factors
    # must agree tightly with single-chip in BOTH precisions
    db = np.asarray(fac_d["blocks"], dtype=np.float64)
    sb = np.asarray(fac_s["blocks"], dtype=np.float64)
    tol_blk = 1e-12 if dtype == np.float64 else 1e-4
    assert np.max(np.abs(db - sb)) <= tol_blk * (1 + np.max(np.abs(sb)))
    b = np.linspace(1.0, 2.0, n)
    x = _splu.splu_solve(plan, fac_d, jnp.asarray(b, dtype=dtype))
    A = np.asarray(coo.as_dense())
    resid = np.max(np.abs(A @ np.asarray(x, dtype=np.float64) - b))
    assert resid < (1e-9 if dtype == np.float64 else 1e-3)  # absolute
    assert float(fac_d["phase"]) == float(fac_s["phase"])
    assert abs(float(fac_d["logdet"]) - float(fac_s["logdet"])) < (
        1e-8 if dtype == np.float64 else 1e-2)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_dist_gridmf_matches_single_chip(dtype):
    # node-axis-sharded GRIDMF == single-chip gridmf (sharding
    # constraints change layout, never math); f32 case tracks the
    # driver's absolute-residual contract
    from russell_tpu.parallel import (make_mesh, dist_gridmf_factorize,
                                      dist_gridmf_solve)
    from russell_tpu.sparse import gridmf as _g

    coo = samples.laplacian_2d(33)
    ii, jj, vv = map(np.asarray, coo.triplets())
    n = coo.nrow
    plan = _g.gridmf_analyze(n, ii, jj, (33, 33, 1), leaf_cells=16)
    assert max(lv.n_nodes for lv in plan.levels) >= 8  # actually shards
    mesh = make_mesh(8)
    vals = jnp.asarray(vv, dtype=dtype)
    fac_d = dist_gridmf_factorize(mesh, plan, vals)
    fac_s = jax.jit(lambda v: _g.gridmf_factorize(plan, v))(vals)
    for d in range(len(plan.levels)):
        ds = np.asarray(fac_d["levels"][d]["sir"], dtype=np.float64)
        ss = np.asarray(fac_s["levels"][d]["sir"], dtype=np.float64)
        tol = 1e-12 if dtype == np.float64 else 1e-5
        assert np.max(np.abs(ds - ss)) <= tol * (1 + np.max(np.abs(ss)))
    b = np.linspace(1.0, 2.0, n)
    x = dist_gridmf_solve(mesh, plan, fac_d, jnp.asarray(b, dtype=dtype))
    A = np.asarray(coo.as_dense())
    resid = np.max(np.abs(A @ np.asarray(x, dtype=np.float64) - b))
    assert resid < (1e-9 if dtype == np.float64 else 1e-3)  # absolute
    assert abs(float(fac_d["logdet"]) - float(fac_s["logdet"])) < (
        1e-8 if dtype == np.float64 else 1e-2)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_dist_genmf_matches_single_chip(dtype):
    # class-node-axis-sharded GENMF == single-chip genmf on an irregular
    # pattern (no grid hint); f32 tracks the driver's absolute-residual
    # contract
    from russell_tpu.parallel import (make_mesh, dist_genmf_factorize,
                                      dist_genmf_solve)
    from russell_tpu.sparse import genmf as _g

    coo = samples.laplacian_2d(24)   # pattern only; GENMF sees a graph
    ii, jj, vv = map(np.asarray, coo.triplets())
    n = coo.nrow
    plan = _g.genmf_analyze(n, ii, jj, leaf_target=24)
    assert max(c.n_nodes for c in plan.classes) >= 8  # actually shards
    mesh = make_mesh(8)
    vals = jnp.asarray(vv, dtype=dtype)
    fac_d = dist_genmf_factorize(mesh, plan, vals)
    fac_s = jax.jit(lambda v: _g.genmf_factorize(plan, v))(vals)
    b = np.linspace(1.0, 2.0, n)
    x = dist_genmf_solve(mesh, plan, fac_d, jnp.asarray(b, dtype=dtype))
    x_s = jax.jit(lambda f, v: _g.genmf_solve(plan, f, v))(
        fac_s, jnp.asarray(b, dtype=dtype))
    A = np.asarray(coo.as_dense())
    resid = np.max(np.abs(A @ np.asarray(x, dtype=np.float64) - b))
    assert resid < (1e-9 if dtype == np.float64 else 1e-3)  # absolute
    tol = 1e-12 if dtype == np.float64 else 1e-4
    assert np.max(np.abs(np.asarray(x, np.float64)
                         - np.asarray(x_s, np.float64))) < tol * (
        1 + np.max(np.abs(np.asarray(x_s, np.float64))))
    assert abs(float(fac_d["logdet"]) - float(fac_s["logdet"])) < (
        1e-8 if dtype == np.float64 else 1e-2)
