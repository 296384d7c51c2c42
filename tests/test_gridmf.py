"""GRIDMF (regular-grid nested-dissection multifrontal) tests.

Oracle: dense NumPy solve/slogdet on random 9-point-stencil grid matrices
(the factorization contract of the reference's MUMPS JOB_FACTORIZE,
interface_mumps.c:185-213, specialised to grid problems).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from russell_tpu.sparse.gridmf import (gridmf_analyze, gridmf_factorize,
                                       gridmf_solve)
from russell_tpu.sparse import factor as _factor
from russell_tpu.sparse.enums import Genie


def _stencil_coo(nr, nc, s, rng, reach=1):
    """Full 9-point stencil with all cross-species couplings."""
    ncell = nr * nc
    m = np.arange(ncell)
    i = m % nc
    j = m // nc
    rows, cols = [], []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            keep = ((j + dr >= 0) & (j + dr < nr)
                    & (i + dc >= 0) & (i + dc < nc))
            src = m[keep]
            dst = src + dr * nc + dc
            for k in range(s):
                for k2 in range(s):
                    rows.append(k * ncell + src)
                    cols.append(k2 * ncell + dst)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    n = ncell * s
    vals = rng.normal(size=len(rows)) + 6.0 * (rows == cols)
    return n, rows, cols, vals


@pytest.mark.parametrize("shape", [(5, 8), (13, 11), (33, 33), (27, 40)])
@pytest.mark.parametrize("s", [1, 2])
def test_gridmf_real_solve_and_logdet(shape, s):
    nr, nc = shape
    rng = np.random.default_rng(nr * 100 + nc + s)
    n, rows, cols, vals = _stencil_coo(nr, nc, s, rng)
    plan = gridmf_analyze(n, rows, cols, (nr, nc, s), leaf_cells=4)
    A = np.zeros((n, n))
    np.add.at(A, (rows, cols), vals)
    x_ref = np.linalg.solve(A, np.ones(n))
    _, ld_ref = np.linalg.slogdet(A)
    fac = gridmf_factorize(plan, jnp.asarray(vals))
    x = np.asarray(gridmf_solve(plan, fac, jnp.ones(n)))
    err = np.max(np.abs(x - x_ref)) / max(1.0, np.max(np.abs(x_ref)))
    assert err < 1e-10
    assert abs(float(fac["logdet"]) - ld_ref) < 1e-7 * max(1.0, abs(ld_ref))


@pytest.mark.parametrize("shape,s", [((13, 11), 2), ((33, 33), 1)])
def test_gridmf_complex_planes(shape, s):
    nr, nc = shape
    rng = np.random.default_rng(7)
    n, rows, cols, vals = _stencil_coo(nr, nc, s, rng)
    valc = vals + 0.3j * rng.normal(size=len(vals))
    plan = gridmf_analyze(n, rows, cols, (nr, nc, s), leaf_cells=4)
    A = np.zeros((n, n), complex)
    np.add.at(A, (rows, cols), valc)
    x_ref = np.linalg.solve(A, np.ones(n))
    sign, ld_ref = np.linalg.slogdet(A)
    fac = gridmf_factorize(plan, jnp.asarray(valc))
    x = np.asarray(gridmf_solve(plan, fac, jnp.ones(n, complex)))
    err = np.max(np.abs(x - x_ref)) / max(1.0, np.max(np.abs(x_ref)))
    assert err < 1e-10
    # ghost pivots carry a REAL unit diagonal: log|det| stays exact even
    # on padded (non-2^a) grids
    assert abs(float(fac["logdet"]) - ld_ref) < 1e-7 * max(1.0, abs(ld_ref))
    # full complex determinant phase (MUMPS ICNTL(33) contract):
    # recovered post-hoc from the stored inverse pivot planes
    from russell_tpu.sparse import factor as _factor
    from russell_tpu.sparse.enums import Genie
    sp = _factor.SolvePlan(genie=Genie.AUTO, n=n, rows=rows, cols=cols)
    ph = _factor.det_phase(sp, fac)
    assert abs(ph - sign) < 1e-6


def _stencil_coo_3d(n0, n1, n2, s, rng):
    """Full 27-point stencil with all cross-species couplings."""
    ncell = n0 * n1 * n2
    m = np.arange(ncell)
    c2 = m % n2
    c1 = (m // n2) % n1
    c0 = m // (n1 * n2)
    rows, cols = [], []
    for d0 in (-1, 0, 1):
        for d1 in (-1, 0, 1):
            for d2 in (-1, 0, 1):
                keep = ((c0 + d0 >= 0) & (c0 + d0 < n0)
                        & (c1 + d1 >= 0) & (c1 + d1 < n1)
                        & (c2 + d2 >= 0) & (c2 + d2 < n2))
                src = m[keep]
                dst = src + d0 * n1 * n2 + d1 * n2 + d2
                for k in range(s):
                    for k2 in range(s):
                        rows.append(k * ncell + src)
                        cols.append(k2 * ncell + dst)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    n = ncell * s
    vals = rng.normal(size=len(rows)) + 16.0 * (rows == cols)
    return n, rows, cols, vals


@pytest.mark.parametrize("shape", [(5, 6, 4), (7, 7, 7), (9, 5, 11)])
@pytest.mark.parametrize("s", [1, 2])
def test_gridmf_3d_real_solve_and_logdet(shape, s):
    n0, n1, n2 = shape
    rng = np.random.default_rng(n0 * 100 + n1 * 10 + n2 + s)
    n, rows, cols, vals = _stencil_coo_3d(n0, n1, n2, s, rng)
    plan = gridmf_analyze(n, rows, cols, (n0, n1, n2, s), leaf_cells=8)
    A = np.zeros((n, n))
    np.add.at(A, (rows, cols), vals)
    x_ref = np.linalg.solve(A, np.ones(n))
    _, ld_ref = np.linalg.slogdet(A)
    fac = gridmf_factorize(plan, jnp.asarray(vals))
    x = np.asarray(gridmf_solve(plan, fac, jnp.ones(n)))
    err = np.max(np.abs(x - x_ref)) / max(1.0, np.max(np.abs(x_ref)))
    assert err < 1e-9
    assert abs(float(fac["logdet"]) - ld_ref) < 1e-7 * max(1.0, abs(ld_ref))


def test_gridmf_3d_complex_planes():
    rng = np.random.default_rng(11)
    n, rows, cols, vals = _stencil_coo_3d(6, 5, 7, 1, rng)
    valc = vals + 0.3j * rng.normal(size=len(vals))
    plan = gridmf_analyze(n, rows, cols, (6, 5, 7, 1), leaf_cells=8)
    A = np.zeros((n, n), complex)
    np.add.at(A, (rows, cols), valc)
    x_ref = np.linalg.solve(A, np.ones(n))
    fac = gridmf_factorize(plan, jnp.asarray(valc))
    x = np.asarray(gridmf_solve(plan, fac, jnp.ones(n, complex)))
    err = np.max(np.abs(x - x_ref)) / max(1.0, np.max(np.abs(x_ref)))
    assert err < 1e-9


def test_gridmf_3d_laplacian_through_factor():
    # the MM-suite generator end to end: analyze picks GRIDMF off the
    # 4-tuple hint; mixed f32 + refinement meets the 1e-10 rel-error bar
    from russell_tpu.sparse import samples as _ssamples
    coo = _ssamples.laplacian_3d(7, conv=0.4)   # unsymmetric
    rows = np.asarray(coo.indices_i[:coo.nnz])
    cols = np.asarray(coo.indices_j[:coo.nnz])
    n = coo.nrow
    plan = _factor.analyze(n, rows, cols, grid=(7, 7, 7, 1),
                           dense_threshold=8)
    assert plan.genie == Genie.GRIDMF
    vals = np.asarray(coo.values[:coo.nnz])
    fac = _factor.numeric_factorize(plan, jnp.asarray(vals))
    b = jnp.ones(n)
    x = np.asarray(_factor.factor_solve(plan, fac, b))
    A = np.zeros((n, n))
    np.add.at(A, (rows, cols), vals)
    rel = np.max(np.abs(A @ x - 1.0)) / (np.max(np.abs(vals)) + 1.0)
    assert rel < 1e-10


def test_gridmf_rejects_non_cell_local():
    # periodic wrap couples cell 0 to cell nc-1: reach > 1
    nr = nc = 8
    n = nr * nc
    m = np.arange(n)
    rows = np.concatenate([m, m])
    cols = np.concatenate([m, (m + 1) % nc + (m // nc) * nc])
    with pytest.raises(ValueError):
        gridmf_analyze(n, rows, cols, (nr, nc, 1))


def test_gridmf_f32_with_refinement_meets_driver_tolerance():
    # the dryrun contract solves in f32; refinement must deliver 1e-3 abs
    nr = nc = 20
    rng = np.random.default_rng(3)
    n, rows, cols, vals = _stencil_coo(nr, nc, 2, rng)
    plan = _factor.analyze(n, rows, cols, genie=Genie.GRIDMF,
                           grid=(nr, nc, 2), dense_threshold=8,
                           mixed_precision=True)
    assert plan.genie == Genie.GRIDMF
    v32 = jnp.asarray(vals, dtype=jnp.float32)
    fac = _factor.numeric_factorize(plan, v32)
    b = jnp.ones(n, jnp.float32)
    x = np.asarray(_factor.factor_solve(plan, fac, b))
    A = np.zeros((n, n))
    np.add.at(A, (rows, cols), vals)
    resid = np.max(np.abs(A @ x - 1.0))
    assert resid < 1e-3


def test_analyze_auto_prefers_gridmf_with_hint():
    from russell_tpu.ode import samples as _osamples
    system, _t0, _y0, _args = _osamples.brusselator_pde(2e-3, 33)
    ii, jj = system.jac_structure
    plan = _factor.analyze(system.ndim, np.asarray(ii), np.asarray(jj),
                           grid=system.grid)
    assert plan.genie == Genie.GRIDMF
    assert plan.effective_ordering == "nd-grid"
    # second book (periodic) must FALL BACK, not fail
    system2, _t, _y, _a = _osamples.brusselator_pde(2e-3, 33,
                                                    second_book=True)
    assert system2.grid is None


def test_gridmf_brusselator_jacobian_solve():
    # the actual flagship matrix: K = gamma*M - J at the initial state
    from russell_tpu.ode import samples as _osamples
    npoint = 17
    system, t0, yy0, _args = _osamples.brusselator_pde(2e-3, npoint)
    ii, jj = (np.asarray(v) for v in system.jac_structure)
    n = system.ndim
    jv = np.asarray(system.jacobian(t0, jnp.asarray(yy0), None))
    rows = np.concatenate([ii, np.arange(n)])
    cols = np.concatenate([jj, np.arange(n)])
    gamma = 120.0
    data = np.concatenate([-jv, np.full(n, gamma)])
    plan = _factor.analyze(n, rows, cols, grid=system.grid,
                           dense_threshold=8)
    assert plan.genie == Genie.GRIDMF
    fac = _factor.numeric_factorize(plan, jnp.asarray(data))
    b = jnp.asarray(np.sin(np.arange(n)))
    x = np.asarray(_factor.factor_solve(plan, fac, b))
    A = np.zeros((n, n))
    np.add.at(A, (rows, cols), data)
    assert np.max(np.abs(A @ x - np.asarray(b))) < 1e-9


def test_gridmf_radau5_matches_banded():
    # same integration through GRIDMF and BANDED: solution must agree
    from russell_tpu.ode import Method, OdeSolver, Params
    from russell_tpu.ode import samples as _osamples

    ys = {}
    for genie in (Genie.GRIDMF, Genie.BANDED):
        system, t0, yy0, _args = _osamples.brusselator_pde(2e-3, 9)
        params = Params(Method.RADAU5)
        params.set_tolerances(1e-4, 1e-4)
        params.newton.genie = genie
        if genie == Genie.GRIDMF:
            params.newton.lin_sol_params = __import__(
                "russell_tpu.sparse.lin_solver", fromlist=["LinSolParams"]
            ).LinSolParams(dense_threshold=8)
        sol = OdeSolver(params, system)
        y = sol.solve(yy0, t0, 0.5, args=None)
        st = sol.stats()
        ys[genie] = (np.asarray(y), st.n_steps, st.n_accepted)
    yg, sg, ag = ys[Genie.GRIDMF]
    yb, sb, ab = ys[Genie.BANDED]
    assert np.all(np.isfinite(yg))
    assert np.max(np.abs(yg - yb)) < 1e-6
    assert (sg, ag) == (sb, ab)


def test_gridmf_determinant_sign():
    # signed determinant through the multifrontal path (MUMPS ICNTL(33)
    # analog): flip one row of the 8x8 Laplacian -> det < 0; mantissa
    # sign and base-10 exponent must match numpy slogdet
    from russell_tpu.sparse import CooMatrix, LinSolver, samples
    from russell_tpu.sparse.enums import Genie
    from russell_tpu.sparse.lin_solver import LinSolParams

    coo = samples.laplacian_2d(8)
    ii, jj, vv = map(np.asarray, coo.triplets())
    vv = vv.copy()
    vv[ii == 13] *= -1.0
    m = CooMatrix.from_arrays(coo.nrow, coo.ncol, ii, jj, vv)
    p = LinSolParams()
    p.grid = (8, 8, 1)
    sol = LinSolver(Genie.GRIDMF)
    sol.factorize(m, p)
    mant, base, expo = sol.determinant()
    sign, logabs = np.linalg.slogdet(np.asarray(m.as_dense()))
    assert base == 10.0
    assert np.sign(mant) == sign == -1.0
    got_log10 = expo + np.log10(abs(mant))
    assert abs(got_log10 - logabs / np.log(10.0)) < 1e-8


def test_gridmf_out_of_core_matches_incore(monkeypatch):
    # force the OOC path with a tiny HBM budget: the eager host-streamed
    # factorization must agree with the in-core jitted one, and the
    # LinSolver surface (incl. determinant) must work end to end
    # (cuDSS hybrid host/device memory-mode analog, interface_cudss.cu:351)
    from russell_tpu.sparse import samples as _ssamples
    coo = _ssamples.laplacian_2d(24)
    rows = np.asarray(coo.indices_i[:coo.nnz])
    cols = np.asarray(coo.indices_j[:coo.nnz])
    vals = np.asarray(coo.values[:coo.nnz])
    n = coo.nrow
    b = np.sin(np.arange(n))

    plan_ic = _factor.analyze(n, rows, cols, genie=Genie.GRIDMF,
                              grid=(24, 24, 1))
    assert not plan_ic.gridmf_ooc
    fac_ic = _factor.numeric_factorize(plan_ic, jnp.asarray(vals))
    x_ic = np.asarray(_factor.factor_solve(plan_ic, fac_ic, jnp.asarray(b)))

    monkeypatch.setenv("RUSSELL_TPU_GRIDMF_MEM_GB", "1e-9")
    plan = _factor.analyze(n, rows, cols, genie=Genie.GRIDMF,
                           grid=(24, 24, 1))
    assert plan.gridmf_ooc
    fac = _factor.numeric_factorize(plan, jnp.asarray(vals))
    # factors live on HOST
    assert isinstance(fac["levels"][0]["sir"], np.ndarray)
    x = np.asarray(_factor.factor_solve(plan, fac, jnp.asarray(b)))
    assert np.max(np.abs(x - x_ic)) < 1e-12 * max(1.0, np.max(np.abs(x_ic)))
    assert abs(float(fac["logdet"]) - float(fac_ic["logdet"])) < 1e-8

    # LinSolver end to end under the tiny budget
    from russell_tpu.sparse import LinSolver, LinSolParams, VerifyLinSys
    sol = LinSolver(Genie.GRIDMF)
    sol.factorize(coo, LinSolParams(grid=(24, 24, 1)))
    assert sol.stats.output.get("out_of_core") is True
    xs = sol.solve(b)
    v = VerifyLinSys.from_system(coo, xs, b)
    assert v.relative_error < 1e-10
    mant, base, expo = sol.determinant()
    sign, logabs = np.linalg.slogdet(np.asarray(coo.as_dense()))
    assert np.sign(mant) == sign
    assert abs(expo + np.log10(abs(mant)) - logabs / np.log(10)) < 1e-7

    # complex is explicitly not supported out of core
    with pytest.raises(NotImplementedError):
        _factor.numeric_factorize(plan, jnp.asarray(vals + 0j))


def test_gridmf_mixed_precision_backward_error_at_machine_eps():
    # the adaptive two-tier refinement (plain IR + FGMRES-IR restarts,
    # factor.py) must push the Arioli-Demmel-Duff backward error of an
    # f32-factored solve to ~f64 machine eps — plain fixed-count
    # refinement measurably fails this on ill-conditioned operators
    # (laplacian_2d_1000 on-chip diverged to rel_err 0.119)
    from russell_tpu.sparse import samples as _ssamples
    coo = _ssamples.laplacian_2d(48)
    rows = np.asarray(coo.indices_i[:coo.nnz])
    cols = np.asarray(coo.indices_j[:coo.nnz])
    vals = np.asarray(coo.values[:coo.nnz])
    plan = _factor.analyze(coo.nrow, rows, cols, genie=Genie.GRIDMF,
                           grid=(48, 48, 1), mixed_precision=True)
    fac = _factor.numeric_factorize(plan, jnp.asarray(vals))
    b = np.sin(np.arange(coo.nrow))
    x = np.asarray(_factor.factor_solve(plan, fac, jnp.asarray(b)))
    A = np.zeros((coo.nrow, coo.nrow))
    np.add.at(A, (rows, cols), vals)
    w = np.max(np.abs(A @ x - b) / (np.abs(A) @ np.abs(x) + np.abs(b)
                                    + 1e-300))
    assert w < 5 * np.finfo(np.float64).eps, w


def test_gridmf_mixed_precision_anisotropic_fgmres():
    # strong anisotropy widens kappa(A) past what plain refinement can
    # close with f32 factors; the Givens-QR FGMRES tier must still reach
    # ~machine eps. Also covers the GMRES 'lucky breakdown' path: with a
    # twice-refined preconditioner h_{j+1,j} underflows mid-cycle
    # (measured 1.5e-10 at j=0), which poisoned the earlier
    # normal-equations least-squares solve.
    from russell_tpu.sparse import samples as _ssamples
    coo = _ssamples.laplacian_2d(64, kx=1.0, ky=1e-6)
    rows = np.asarray(coo.indices_i[:coo.nnz])
    cols = np.asarray(coo.indices_j[:coo.nnz])
    vals = np.asarray(coo.values[:coo.nnz])
    plan = _factor.analyze(coo.nrow, rows, cols, genie=Genie.GRIDMF,
                           grid=(64, 64, 1), mixed_precision=True)
    fac = _factor.numeric_factorize(plan, jnp.asarray(vals))
    b = np.sin(np.arange(coo.nrow))
    x = np.asarray(_factor.factor_solve(plan, fac, jnp.asarray(b)))
    A = np.zeros((coo.nrow, coo.nrow))
    np.add.at(A, (rows, cols), vals)
    w = np.max(np.abs(A @ x - b) / (np.abs(A) @ np.abs(x) + np.abs(b)
                                    + 1e-300))
    assert w < 5 * np.finfo(np.float64).eps, w


def test_ooc_chunked_fronts_matches_in_core(monkeypatch):
    # depths whose full front batch exceeds the chunk budget assemble
    # and factor per node chunk with the child Schur on host
    # (RESOURCE_EXHAUSTED fix for 120^3); must match the in-core answer
    import numpy as np
    from russell_tpu.sparse import (Genie, LinSolver, LinSolParams,
                                    VerifyLinSys, samples)

    monkeypatch.setenv("RUSSELL_TPU_GRIDMF_MEM_GB", "1e-9")
    monkeypatch.setenv("RUSSELL_TPU_GRIDMF_CHUNK_GB", "2e-5")
    coo = samples.laplacian_2d(24)
    sol = LinSolver(Genie.GRIDMF)
    sol.factorize(coo, LinSolParams(grid=(24, 24, 1),
                                    mixed_precision=True))
    assert sol.plan.gridmf_ooc
    b = np.sin(np.arange(coo.nrow))
    x = sol.solve(b)
    assert VerifyLinSys.from_system(coo, x, b).relative_error < 1e-10

    monkeypatch.setenv("RUSSELL_TPU_GRIDMF_MEM_GB", "100")
    sol2 = LinSolver(Genie.GRIDMF)
    sol2.factorize(coo, LinSolParams(grid=(24, 24, 1),
                                     mixed_precision=True))
    x2 = sol2.solve(b)
    assert float(np.max(np.abs(np.asarray(x) - np.asarray(x2)))) < 1e-12
