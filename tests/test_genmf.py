"""GENMF (general-matrix nested-dissection multifrontal) tests.

Oracle: dense NumPy solve/slogdet on irregular random sparse matrices
(the factorization contract of MUMPS/UMFPACK on general patterns,
interface_mumps.c JOB_FACTORIZE / interface_umfpack.c:109-167 — the
reference's Raj1/ASIC_680k benchmark class).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from russell_tpu.sparse.genmf import genmf_analyze, genmf_factorize, \
    genmf_solve
from russell_tpu.sparse import factor as _factor
from russell_tpu.sparse.enums import Genie


def _irregular_coo(n, seed, avg_deg=4, long_frac=0.5, dom=1.0):
    """Random quasi-1-D graph with long-range edges: irregular degree
    distribution, no grid structure (the anti-GRIDMF case)."""
    r = np.random.default_rng(seed)
    ii, jj = [], []
    for _ in range(avg_deg):
        src = np.arange(n)
        dst = np.clip(src + r.integers(-6, 7, n), 0, n - 1)
        ii.append(src)
        jj.append(dst)
    m = int(n * long_frac)
    ii.append(r.integers(0, n, m))
    jj.append(r.integers(0, n, m))
    ii = np.concatenate(ii)
    jj = np.concatenate(jj)
    ii, jj = (np.concatenate([ii, jj, np.arange(n)]),
              np.concatenate([jj, ii, np.arange(n)]))
    key = np.unique(ii * np.int64(n) + jj)
    ii, jj = key // n, key % n
    vals = r.normal(size=len(ii))
    diag = ii == jj
    vals[diag] = 0.0
    rowsum = np.zeros(n)
    np.add.at(rowsum, ii, np.abs(vals))
    vals[diag] = rowsum[ii[diag]] + dom
    return ii, jj, vals


@pytest.mark.parametrize("n,seed,leaf", [(60, 0, 8), (350, 1, 16),
                                         (1100, 2, 48)])
def test_genmf_real_solve_and_logdet(n, seed, leaf):
    ii, jj, vals = _irregular_coo(n, seed)
    plan = genmf_analyze(n, ii, jj, leaf_target=leaf)
    A = np.zeros((n, n))
    A[ii, jj] = vals
    x_ref = np.linalg.solve(A, np.ones(n))
    _, ld_ref = np.linalg.slogdet(A)
    fac = genmf_factorize(plan, jnp.asarray(vals))
    x = np.asarray(genmf_solve(plan, fac, jnp.ones(n)))
    err = np.max(np.abs(x - x_ref)) / max(1.0, np.max(np.abs(x_ref)))
    assert err < 1e-10
    assert abs(float(fac["logdet"]) - ld_ref) < 1e-7 * max(1.0, abs(ld_ref))


def test_genmf_complex_planes():
    n = 420
    ii, jj, vals = _irregular_coo(n, 3)
    rng = np.random.default_rng(9)
    valc = vals + 0.3j * rng.normal(size=len(vals))
    plan = genmf_analyze(n, ii, jj, leaf_target=24)
    A = np.zeros((n, n), complex)
    A[ii, jj] = valc
    b = np.linspace(1.0, 2.0, n) + 0.5j
    x_ref = np.linalg.solve(A, b)
    fac = genmf_factorize(plan, jnp.asarray(valc))
    x = np.asarray(genmf_solve(plan, fac, jnp.asarray(b)))
    err = np.max(np.abs(x - x_ref)) / max(1.0, np.max(np.abs(x_ref)))
    assert err < 1e-10
    assert abs(float(fac["logdet"])
               - np.linalg.slogdet(A)[1]) < 1e-6
    # full complex determinant phase (MUMPS ICNTL(33) contract)
    from russell_tpu.sparse import factor as _factor
    from russell_tpu.sparse.enums import Genie
    sp = _factor.SolvePlan(genie=Genie.AUTO, n=n, rows=ii, cols=jj)
    ph = _factor.det_phase(sp, fac)
    assert abs(ph - np.linalg.slogdet(A)[0]) < 1e-6


def test_genmf_disconnected_graph():
    # two independent blocks + an isolated diagonal var: the ND tree is
    # a forest; the solve must still be exact
    n1, n2 = 90, 70
    i1, j1, v1 = _irregular_coo(n1, 5)
    i2, j2, v2 = _irregular_coo(n2, 6)
    n = n1 + n2 + 1
    ii = np.concatenate([i1, i2 + n1, [n - 1]])
    jj = np.concatenate([j1, j2 + n1, [n - 1]])
    vals = np.concatenate([v1, v2, [3.5]])
    plan = genmf_analyze(n, ii, jj, leaf_target=16)
    A = np.zeros((n, n))
    A[ii, jj] = vals
    x_ref = np.linalg.solve(A, np.ones(n))
    fac = genmf_factorize(plan, jnp.asarray(vals))
    x = np.asarray(genmf_solve(plan, fac, jnp.ones(n)))
    assert np.max(np.abs(x - x_ref)) < 1e-10 * max(1.0,
                                                   np.max(np.abs(x_ref)))


def test_genmf_through_factor_auto():
    # AUTO must route large irregular patterns (bad RCM bandwidth) to
    # GENMF; mixed f32 + refinement meets the 1e-10 relative-error bar
    n = 2000
    ii, jj, vals = _irregular_coo(n, 7, long_frac=1.0)
    plan = _factor.analyze(n, ii, jj, dense_threshold=500, max_block=64)
    assert plan.genie == Genie.GENMF
    assert plan.effective_ordering == "nd-general"
    fac = _factor.numeric_factorize(plan, jnp.asarray(vals))
    b = jnp.ones(n)
    x = np.asarray(_factor.factor_solve(plan, fac, b))
    A = np.zeros((n, n))
    A[ii, jj] = vals
    rel = np.max(np.abs(A @ x - 1.0)) / (np.max(np.abs(vals)) + 1.0)
    assert rel < 1e-10


def test_genmf_f32_with_refinement():
    n = 900
    ii, jj, vals = _irregular_coo(n, 8)
    plan = _factor.analyze(n, ii, jj, genie=Genie.GENMF,
                           mixed_precision=True)
    v32 = jnp.asarray(vals, dtype=jnp.float32)
    fac = _factor.numeric_factorize(plan, v32)
    x = np.asarray(_factor.factor_solve(plan, fac, jnp.ones(n, jnp.float32)))
    A = np.zeros((n, n))
    A[ii, jj] = vals
    assert np.max(np.abs(A @ x - 1.0)) < 1e-3


def test_genmf_matches_splu_on_same_matrix():
    # same matrix through both general-purpose engines
    n = 800
    ii, jj, vals = _irregular_coo(n, 10)
    b = np.sin(np.arange(n))
    xs = {}
    for genie in (Genie.GENMF, Genie.SPLU):
        plan = _factor.analyze(n, ii, jj, genie=genie)
        fac = _factor.numeric_factorize(plan, jnp.asarray(vals))
        xs[genie] = np.asarray(_factor.factor_solve(plan, fac,
                                                    jnp.asarray(b)))
    assert np.max(np.abs(xs[Genie.GENMF] - xs[Genie.SPLU])) < 1e-9


def test_genmf_lin_solver_end_to_end():
    # LinSolver surface: factorize/solve/determinant/stats on GENMF
    from russell_tpu.sparse import CooMatrix, LinSolver, VerifyLinSys
    n = 500
    ii, jj, vals = _irregular_coo(n, 11)
    m = CooMatrix.from_arrays(n, n, ii, jj, vals)
    sol = LinSolver(Genie.GENMF)
    sol.factorize(m)
    rhs = np.ones(n)
    x = sol.solve(rhs)
    v = VerifyLinSys.from_system(m, x, rhs)
    assert v.relative_error < 1e-10
    mant, base, expo = sol.determinant()
    sign, logabs = np.linalg.slogdet(np.asarray(m.as_dense()))
    assert base == 10.0
    assert np.sign(mant) == sign
    assert abs((expo + np.log10(abs(mant)))
               - logabs / np.log(10.0)) < 1e-7
    assert sol.stats.output["effective_ordering"] == "nd-general"


def test_genmf_brusselator_jacobian_no_hint():
    # the flagship matrix WITHOUT its grid hint: GENMF must handle the
    # stencil pattern as a general graph and agree with GRIDMF
    from russell_tpu.ode import samples as _osamples
    npoint = 13
    system, t0, yy0, _args = _osamples.brusselator_pde(2e-3, npoint)
    ii, jj = (np.asarray(v) for v in system.jac_structure)
    n = system.ndim
    jv = np.asarray(system.jacobian(t0, jnp.asarray(yy0), None))
    rows = np.concatenate([ii, np.arange(n)])
    cols = np.concatenate([jj, np.arange(n)])
    data = np.concatenate([-jv, np.full(n, 120.0)])
    plan = _factor.analyze(n, rows, cols, genie=Genie.GENMF)
    fac = _factor.numeric_factorize(plan, jnp.asarray(data))
    b = jnp.asarray(np.sin(np.arange(n)))
    x = np.asarray(_factor.factor_solve(plan, fac, b))
    A = np.zeros((n, n))
    np.add.at(A, (rows, cols), data)
    assert np.max(np.abs(A @ x - np.asarray(b))) < 1e-9


def test_genmf_stepped_drivers_match_single_program():
    # per-class jitted steps (the TPU fusion-emitter workaround path)
    # must reproduce the single-program factorize/solve exactly
    ii, jj, vals = _irregular_coo(700, 4)
    n = 700
    plan = genmf_analyze(n, ii, jj, leaf_target=48)
    from russell_tpu.sparse.genmf import (genmf_factorize_steps,
                                          genmf_solve_steps)
    v = jnp.asarray(vals)
    b = jnp.asarray(np.sin(np.arange(n)))
    fac1 = genmf_factorize(plan, v)
    x1 = np.asarray(genmf_solve(plan, fac1, b))
    fac2 = genmf_factorize_steps(plan, v)
    x2 = np.asarray(genmf_solve_steps(plan, fac2, b))
    assert np.max(np.abs(x1 - x2)) < 1e-12 * max(1.0, np.max(np.abs(x1)))
    assert abs(float(fac1["logdet"]) - float(fac2["logdet"])) < 1e-9


def test_genmf_stepped_complex_matches_single_program():
    # complex stepped path (real/imag Karatsuba planes per class; VERDICT
    # r3 item 7 — irregular complex systems need a TPU-compilable route):
    # must reproduce the whole-program complex factorize/solve
    n = 500
    ii, jj, vals = _irregular_coo(n, 11)
    rng = np.random.default_rng(13)
    valc = vals + 0.4j * rng.normal(size=len(vals))
    plan = genmf_analyze(n, ii, jj, leaf_target=32)
    from russell_tpu.sparse.genmf import (genmf_factorize_steps,
                                          genmf_solve_steps)
    v = jnp.asarray(valc)
    b = jnp.asarray(np.cos(np.arange(n)) + 0.25j * np.sin(np.arange(n)))
    fac1 = genmf_factorize(plan, v)
    x1 = np.asarray(genmf_solve(plan, fac1, b))
    fac2 = genmf_factorize_steps(plan, v)
    assert fac2["classes"][0]["sii"] is not None or any(
        st["sii"] is not None for st in fac2["classes"] if st["sir"]
        is not None)
    x2 = np.asarray(genmf_solve_steps(plan, fac2, b))
    assert np.max(np.abs(x1 - x2)) < 1e-10 * max(1.0, np.max(np.abs(x1)))
    assert abs(float(fac1["logdet"]) - float(fac2["logdet"])) < 1e-7
    # oracle check against the dense solve
    A = np.zeros((n, n), complex)
    A[ii, jj] = valc
    x_ref = np.linalg.solve(A, np.asarray(b))
    assert np.max(np.abs(x2 - x_ref)) < 1e-9 * max(1.0,
                                                   np.max(np.abs(x_ref)))


def test_genmf_stepped_complex_eager_dispatch_with_host_rhs():
    # the exact on-chip dispatch: genmf_steps plan, eager
    # numeric_factorize/factor_solve, HOST numpy complex data and rhs
    # (the axon transfer workaround ships real/imag planes and rebuilds
    # the complex arrays in-trace); mixed precision (c64 factors) plus
    # adaptive refinement must still meet the input-precision bar
    n = 600
    ii, jj, vals = _irregular_coo(n, 17)
    rng = np.random.default_rng(19)
    valc = (vals + 0.2j * rng.normal(size=len(vals))).astype(np.complex128)
    plan = _factor.analyze(n, ii, jj, genie=Genie.GENMF,
                           mixed_precision=True)
    plan.genmf_steps = True    # forced (CPU backend defaults to False)
    fac = _factor.numeric_factorize(plan, valc)
    b = (np.ones(n) + 0.5j * np.linspace(0.0, 1.0, n)).astype(np.complex128)
    x = np.asarray(_factor.factor_solve(plan, fac, b))
    A = np.zeros((n, n), complex)
    A[ii, jj] = valc
    resid = np.max(np.abs(A @ x - b))
    # complex mixed precision refines at c64 (the TPU backend has no
    # complex128 at all), so the achievable floor is O(100 eps_c64)
    # componentwise — measured 2e-8 relative here. Full 1e-10-bar
    # complex accuracy needs mixed_precision=False (c128 factors, CPU)
    assert resid < 1e-7 * np.max(np.abs(A))


def test_genmf_complex_plane_solve_f64_accuracy():
    # factor_solve_planes: f64-plane refinement over the c64 stepped
    # factorization must reach f64-class accuracy — the TPU-native
    # answer to "no complex128 dtype on the backend"
    from russell_tpu.sparse import CooMatrix, LinSolver, LinSolParams
    n = 500
    ii, jj, vals = _irregular_coo(n, 23)
    rng = np.random.default_rng(29)
    valc = (vals + 0.3j * rng.normal(size=len(vals))).astype(np.complex128)
    coo = CooMatrix.from_arrays(n, n, ii, jj, valc)
    solver = LinSolver(Genie.GENMF)
    solver.factorize(coo, LinSolParams(mixed_precision=True))
    b = (np.cos(np.arange(n)) + 0.5j * np.sin(np.arange(n)))
    xr, xi = solver.solve_planes(b.real, b.imag)
    x = np.asarray(xr) + 1j * np.asarray(xi)
    A = np.zeros((n, n), complex)
    A[ii, jj] = valc
    resid = np.max(np.abs(A @ x - b))
    # c64 API floor is ~2e-8 relative (see the eager-dispatch test);
    # plane refinement must beat it by >= 4 decades
    assert resid < 1e-12 * np.max(np.abs(A))


def test_genmf_whole_program_fallback_bookkeeping():
    # the TPU driver prefers ONE whole-program jit per numeric phase and
    # must remember a backend rejection (kSublaneGather / response-size
    # aborts) so later calls go straight to the stepped drivers
    import warnings
    import numpy as np
    from russell_tpu.sparse import factor as _factor
    from russell_tpu.sparse.enums import Genie

    n = 300
    ii, jj, vals = _irregular_coo(n, 3)
    plan = _factor.analyze(n, ii, jj, genie=Genie.GENMF)
    assert _factor._genmf_whole(plan, "fact", np.dtype(np.float32)) \
        is not None
    # complex gets its own whole-program jit (planes in-trace; device
    # arguments never cross the transfer layer)
    assert _factor._genmf_whole(plan, "fact",
                                np.dtype(np.complex64)) is not None
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _factor._genmf_whole_reject(plan, "fact", np.dtype(np.float32),
                                    RuntimeError("simulated abort"))
    assert _factor._genmf_whole(plan, "fact", np.dtype(np.float32)) \
        is None
    # the solve phase is tracked independently
    assert _factor._genmf_whole(plan, "solve", np.dtype(np.float32)) \
        is not None
    # env off-switch skips the whole-program attempt entirely
    import os
    os.environ["RUSSELL_TPU_GENMF_WHOLE"] = "0"
    try:
        assert _factor._genmf_whole(plan, "solve",
                                    np.dtype(np.float64)) is None
    finally:
        del os.environ["RUSSELL_TPU_GENMF_WHOLE"]


def test_whole_program_probe_cache(tmp_path, monkeypatch):
    # VERDICT r4 item 10: a rejected whole-program compile is recorded
    # in a cross-process probe cache; later processes skip the doomed
    # multi-minute compile attempt entirely.
    import numpy as np
    from russell_tpu.sparse import Genie, samples
    from russell_tpu.sparse import factor as F

    monkeypatch.setattr(F, "_genmf_probe_path",
                        lambda: str(tmp_path / "probe.json"))
    coo = samples.irregular_geometric(1500)
    ii = np.asarray(coo.indices_i[:coo.nnz])
    jj = np.asarray(coo.indices_j[:coo.nnz])
    plan = F.analyze(coo.nrow, ii, jj, genie=Genie.GENMF)
    key = F._genmf_probe_key(plan, "fact", "float32")
    F._genmf_whole_reject(plan, "fact", "float32",
                          RuntimeError("SIGKILL (9)"))
    assert F._genmf_probe_load()[key]["verdict"] == "rejected"

    # a FRESH plan (new process analog) must skip the whole attempt
    plan2 = F.analyze(coo.nrow, ii, jj, genie=Genie.GENMF)
    assert F._genmf_whole(plan2, "fact", "float32") is None
    # other dtypes/kinds are unaffected
    assert F._genmf_whole(plan2, "solve", "float32") is not None


def test_genmf_refine_whole_one_dispatch():
    # the stepped-GENMF adaptive solve routes through ONE jitted
    # IR+CG refinement around the whole-program solve graph when the
    # system is symmetric (TPU production path; here forced on CPU) —
    # must match the eager-loop answer to the 1e-10 contract
    import numpy as np
    import jax.numpy as jnp
    from russell_tpu.sparse import factor as F
    from russell_tpu.sparse import samples
    from russell_tpu.sparse.enums import Genie

    coo = samples.laplacian_2d(28)          # symmetric values
    ii = np.asarray(coo.indices_i[:coo.nnz])
    jj = np.asarray(coo.indices_j[:coo.nnz])
    vv = np.asarray(coo.values[:coo.nnz]).astype(np.float64)
    plan = F.analyze(coo.nrow, ii, jj, genie=Genie.GENMF,
                     mixed_precision=True)
    plan.genmf_steps = True
    plan.symmetric_values = True
    fac = F.numeric_factorize(plan, vv)
    b = np.sin(np.arange(coo.nrow)).astype(np.float64)
    x = F.factor_solve(plan, fac, b)
    # the jitted refine path must have been built (not rejected)
    assert plan._genmf_whole_fns.get(("refine", "float64")) not in (
        None, False)
    A = np.zeros((coo.nrow, coo.nrow))
    np.add.at(A, (ii, jj), vv)
    rel = (np.max(np.abs(A @ np.asarray(x) - b))
           / max(np.max(np.abs(b)), 1e-30))
    assert rel < 1e-10

    # eager fallback must agree when the jit is marked rejected
    plan2 = F.analyze(coo.nrow, ii, jj, genie=Genie.GENMF,
                      mixed_precision=True)
    plan2.genmf_steps = True
    plan2.symmetric_values = True
    plan2._genmf_whole_fns = {("refine", "float64"): False}
    fac2 = F.numeric_factorize(plan2, vv)
    x2 = F.factor_solve(plan2, fac2, b)
    assert np.max(np.abs(np.asarray(x) - np.asarray(x2))) < 1e-9
