"""Continuation tests (mirrors russell_nonlin's test strategy: circle,
fold-point, and Newton-only problems; tests/test_arc_*.rs)."""

import math

import numpy as np
import pytest

from russell_tpu.nonlin import (Config, DeltaLambda, IniDir, Method, Output,
                                Solver, Status, Stop, samples)


def test_newton_only_two_eq_ref():
    # natural method with zero lambda steps == plain Newton solve
    system, u0, u_ref = samples.two_eq_ref()
    system.check_ggu(0.0, u0, tol=1e-12)
    config = Config(method=Method.NATURAL, euler_predictor=False)
    solver = Solver(config, system)
    u, l, status = solver.solve(u0, 0.0, IniDir.POS, Stop.steps(1),
                                DeltaLambda.constant(1.0))
    assert status.success()
    np.testing.assert_allclose(u, u_ref, atol=1e-6)


def test_natural_continuation_fold_problem():
    # follow lambda = u exp(-u) upward before the fold at lambda = 1/e
    system, u0, l0, lam_ana = samples.one_eq_with_fold_point()
    config = Config(method=Method.NATURAL)
    solver = Solver(config, system)
    u, l, status = solver.solve(u0, l0, IniDir.POS, Stop.max_lambda(0.3),
                                DeltaLambda.constant(0.02))
    assert status.success()
    assert l == pytest.approx(0.3, abs=1e-9)
    assert lam_ana(float(u[0])) == pytest.approx(l, abs=1e-8)


def test_arclength_circle():
    # traverse the circle u^2 + l^2 = 1 through BOTH folds
    system, u0, l0 = samples.circle_ul(1.0)
    config = Config(method=Method.ARCLENGTH)
    solver = Solver(config, system)
    out = Output().set_recording([0])
    u, l, status = solver.solve(u0, l0, IniDir.NEG, Stop.steps(200),
                                DeltaLambda.constant(0.05), output=out)
    assert status.success()
    # every visited point stays on the circle
    for ui, li in zip(out.step_u(0), out.step_l):
        assert ui * ui + li * li == pytest.approx(1.0, abs=1e-8)
    # the path crossed lambda = -1 region (passed the fold)
    assert min(out.step_l) < -0.5


def test_arclength_past_fold_point():
    # the Bank-Mittelmann fold at (u, l) = (1, 1/e): arclength passes it
    system, u0, l0, lam_ana = samples.one_eq_with_fold_point()
    config = Config(method=Method.ARCLENGTH)
    solver = Solver(config, system)
    out = Output().set_recording([0])
    u, l, status = solver.solve(u0, l0, IniDir.POS, Stop.max_comp_u(0, 2.5),
                                DeltaLambda.constant(0.05), output=out)
    assert status.success()
    assert float(u[0]) > 2.0  # beyond the fold at u = 1
    # all points satisfy lambda = u exp(-u)
    for ui, li in zip(out.step_u(0), out.step_l):
        assert lam_ana(ui) == pytest.approx(li, abs=1e-7)


def test_arclength_adaptive():
    system, u0, l0 = samples.circle_ul(1.0)
    config = Config(method=Method.ARCLENGTH)
    solver = Solver(config, system)
    out = Output().set_recording([0])
    u, l, status = solver.solve(u0, l0, IniDir.NEG, Stop.steps(100),
                                DeltaLambda.auto(0.05), output=out)
    assert status.success()
    st = solver.stats()
    assert st.n_accepted > 10
    for ui, li in zip(out.step_u(0), out.step_l):
        assert ui * ui + li * li == pytest.approx(1.0, abs=1e-6)


def test_natural_targeting_lambda_exact():
    system, u0, l0, lam_ana = samples.one_eq_with_fold_point()
    solver = Solver(Config(method=Method.NATURAL), system)
    u, l, status = solver.solve(u0, l0, IniDir.POS, Stop.max_lambda(0.25),
                                DeltaLambda.constant(0.04))
    assert status.success()
    assert l == pytest.approx(0.25, abs=1e-12)


def test_delta_lambda_list():
    system, u0, l0, lam_ana = samples.one_eq_with_fold_point()
    solver = Solver(Config(method=Method.NATURAL), system)
    out = Output().set_recording([0])
    u, l, status = solver.solve(u0, l0, IniDir.POS, Stop.steps(3),
                                DeltaLambda.from_list([0.1, 0.05, 0.02]),
                                output=out)
    assert status.success()
    np.testing.assert_allclose(out.step_l, [0.0, 0.1, 0.15, 0.17], atol=1e-12)


def test_autodiff_jacobian_system():
    # no analytical jacobian: autodiff path
    import jax.numpy as jnp
    from russell_tpu.nonlin import System
    system = System(2, lambda l, u, args: jnp.stack(
        [u[0] ** 3 + u[1] - 1.0, -u[0] + u[1] ** 3 + 1.0]))
    solver = Solver(Config(method=Method.NATURAL, euler_predictor=False),
                    system)
    u, l, status = solver.solve(np.array([0.5, 0.5]), 0.0, IniDir.POS,
                                Stop.steps(1), DeltaLambda.constant(1.0))
    assert status.success()
    np.testing.assert_allclose(u, [1.0, 0.0], atol=1e-6)


def test_stats_counters():
    system, u0, u_ref = samples.two_eq_ref()
    solver = Solver(Config(method=Method.NATURAL, euler_predictor=False),
                    system)
    solver.solve(u0, 0.0, IniDir.POS, Stop.steps(1),
                 DeltaLambda.constant(1.0))
    st = solver.stats()
    assert st.n_function > 0 and st.n_jacobian > 0
    assert st.n_factor == st.n_jacobian
    assert st.n_steps == 1 and st.n_accepted == 1
    assert "function evaluations" in st.summary()


def test_arclength_bratu_1d_spc_folds():
    """1-D Bratu by spectral collocation: arclength through the fold(s),
    then extended-system Newton ([G; Gu v; v_k - 1]) polishing each fold.

    Oracles (test_bratu_problem.rs:158-165): lambda_crit = 3.51383071912516
    (alpha=0, Mathematica) and 4.647906373918411 / 3.509919925802271
    (alpha=0.2, from the reference's npt=500 run, itself ~1e-5 accurate).
    The npt=20 spectral discretization + Newton polish recovers the
    alpha=0 fold to 5e-11 — far inside the reference's 0.0028 tolerance.
    """
    import jax
    import jax.numpy as jnp

    def fold_polish(system, u, l):
        n = system.ndim

        def gu_mat(l, u):
            vals, _ = system.calc_jac(l, u, None)
            return jnp.reshape(vals, (n, n))

        m = np.asarray(gu_mat(l, jnp.asarray(u)))
        w, vv = np.linalg.eig(m)
        v = np.real(vv[:, np.argmin(np.abs(w))])
        k = int(np.argmax(np.abs(v)))
        v = v / v[k]
        z = jnp.concatenate([jnp.asarray(u), jnp.asarray(v),
                             jnp.asarray([l])])

        def ff(z):
            u, v, l = z[:n], z[n:2 * n], z[2 * n]
            g = jnp.asarray(system.calc_gg(l, u, None))
            return jnp.concatenate([g, gu_mat(l, u) @ v,
                                    jnp.asarray([v[k] - 1.0])])

        for _ in range(30):
            dz = jnp.linalg.solve(jax.jacfwd(ff)(z), -ff(z))
            z = z + dz
            if float(jnp.max(jnp.abs(dz))) < 1e-12:
                break
        return float(z[2 * n])

    for alpha, want, tol in ((0.0, [3.51383071912516], 1e-9),
                             (0.2, [4.647906373918411,
                                    3.509919925802271], 5e-5)):
        system, u0, l0, mid = samples.bratu_1d_spc(20, alpha)
        sol = Solver(Config(method=Method.ARCLENGTH), system)
        out = Output().set_recording(list(range(system.ndim)))
        _u, _l, status = sol.solve(u0, l0, IniDir.POS,
                                   Stop.max_comp_u(mid, 20.0),
                                   DeltaLambda.auto(0.5), output=out)
        assert status.success()
        ls = np.asarray(out.step_l)
        uu = np.stack([out.step_u(m) for m in range(system.ndim)], axis=1)
        got = []
        for j in range(1, len(ls) - 1):
            if (ls[j] - ls[j - 1]) * (ls[j + 1] - ls[j]) < 0:
                got.append(fold_polish(system, uu[j], ls[j]))
        assert len(got) == len(want), (alpha, got)
        for g, w in zip(got, want):
            assert abs(g - w) < tol, (alpha, g, w)


def test_arclength_bratu_2d_fdm_fold():
    """2-D Bratu on the unit square (5-point FDM + SPS): arclength
    through the fold + extended-Newton polish. Oracle: Bolstad & Keller
    lambda_crit = 6.80812442259 (test_bratu_problem.rs:163); at npt=17
    the FDM discretization error is -0.0060 (pure h^2: -0.0026 at
    npt=25), inside the reference's 0.015 tolerance for this grid."""
    import jax
    import jax.numpy as jnp

    system, u0, l0, mid = samples.bratu_2d_fdm(17, 0.0)
    n = system.ndim

    def gu_mat(l, u):
        vals, _ = system.calc_jac(l, u, None)
        return jnp.zeros((n, n)).at[system.jac_ii, system.jac_jj].add(vals)

    sol = Solver(Config(method=Method.ARCLENGTH), system)
    out = Output().set_recording(list(range(n)))
    _u, _l, status = sol.solve(u0, l0, IniDir.POS, Stop.max_comp_u(mid, 6.0),
                               DeltaLambda.auto(0.5), output=out)
    assert status.success()
    ls = np.asarray(out.step_l)
    uu = np.stack([out.step_u(m) for m in range(n)], axis=1)
    j = int(np.argmax(ls))

    m = np.asarray(gu_mat(ls[j], jnp.asarray(uu[j])))
    w, vv = np.linalg.eig(m)
    v = np.real(vv[:, np.argmin(np.abs(w))])
    k = int(np.argmax(np.abs(v)))
    z = jnp.concatenate([jnp.asarray(uu[j]), jnp.asarray(v / v[k]),
                         jnp.asarray([ls[j]])])

    def ff(z):
        u, v, l = z[:n], z[n:2 * n], z[2 * n]
        g = jnp.asarray(system.calc_gg(l, u, None))
        return jnp.concatenate([g, gu_mat(l, u) @ v,
                                jnp.asarray([v[k] - 1.0])])

    for _ in range(30):
        dz = jnp.linalg.solve(jax.jacfwd(ff)(z), -ff(z))
        z = z + dz
        if float(jnp.max(jnp.abs(dz))) < 1e-11:
            break
    lam = float(z[2 * n])
    assert abs(lam - 6.80812442259) < 0.015
    assert abs(lam - 6.80217410) < 1e-5  # the npt=17 discrete fold itself


def test_newton_cubic_poly_cases():
    # cubic_poly_1 (test_newton_problems.rs): convergent trial reaches
    # the reference root; oscillating and stationary-point trials fail
    # with a max-iterations status instead of hanging
    system, u_ok, u_osc, u_ind, u_ref = samples.cubic_poly_1()
    config = Config(method=Method.NATURAL, euler_predictor=False)
    u, _l, status = Solver(config, system).solve(
        u_ok, 0.0, IniDir.POS, Stop.steps(1), DeltaLambda.constant(1.0))
    assert status.success()
    np.testing.assert_allclose(u, u_ref, atol=1e-10)

    for bad in (u_osc, u_ind):
        _u, _l, status = Solver(config, system).solve(
            bad, 0.0, IniDir.POS, Stop.steps(1), DeltaLambda.constant(1.0))
        assert status.failure(), bad

    # cubic_poly_2: slow but convergent one-sided Newton
    system2, u5, u_ref2 = samples.cubic_poly_2()
    config2 = Config(method=Method.NATURAL, euler_predictor=False,
                     n_iteration_max=60)
    u2, _l, status2 = Solver(config2, system2).solve(
        u5, 0.0, IniDir.POS, Stop.steps(1), DeltaLambda.constant(1.0))
    assert status2.success()
    np.testing.assert_allclose(u2, u_ref2, atol=1e-7)


def test_arclength_singular_initial_state():
    # G = u^(1/3) - lambda: dG/du blows up at u -> 0; the arclength
    # path from a tiny perturbation must stay on lambda = u^(1/3)
    # (test_arc_singular_initial_state.rs)
    for perturbation in (1e-6, 0.05):
        system, u0, l0, lam_ana = samples.singular_initial_state(
            1.0 / 3.0, perturbation)
        config = Config(method=Method.ARCLENGTH)
        out = Output().set_recording([0])
        u, l, status = Solver(config, system).solve(
            u0, l0, IniDir.POS, Stop.steps(5), DeltaLambda.constant(0.5),
            output=out)
        assert status.success()
        for ui, li in zip(out.step_u(0)[1:], out.step_l[1:]):
            assert abs(li - lam_ana(ui)) < 1e-10


def test_multiple_calls_to_solve():
    # a Solver must be reusable: a second solve from the converged state
    # finishes in one iteration with fresh stats
    # (test_multiple_calls_to_solve.rs)
    system, u_ok, _o, _i, u_ref = samples.cubic_poly_1()
    config = Config(method=Method.NATURAL, euler_predictor=False)
    solver = Solver(config, system)
    u, l, status = solver.solve(u_ok, 0.0, IniDir.POS, Stop.steps(1),
                                DeltaLambda.constant(1.0))
    assert status.success()
    np.testing.assert_allclose(u, u_ref, atol=1e-10)
    it1 = solver.work.stats.n_iteration_total

    u2, _l, status2 = solver.solve(u, l, IniDir.POS, Stop.steps(1),
                                   DeltaLambda.constant(1.0))
    assert status2.success()
    np.testing.assert_allclose(u2, u_ref, atol=1e-12)
    assert solver.work.stats.n_iteration_total <= 1  # already converged
    assert it1 > 1


def test_bspline_problem_1_arclength_traces_snap_back():
    # samples.rs:348 bspline_problem_1 + the arclength_bspline example:
    # follow G = u - C(lambda) through the snap-back to C(1)
    system, u0, l0, curve = samples.bspline_problem_1(1.5)
    system.check_ggu(0.3, np.asarray(curve(0.3)), None, 1e-10)
    config = Config(method=Method.ARCLENGTH)
    config.bordering = False
    config.tg_control_tol = 0.2
    solver = Solver(config, system)
    out = Output().set_recording([0, 1])
    u, l, status = solver.solve(u0, l0, IniDir.POS, Stop.max_lambda(1.0),
                                DeltaLambda.auto(0.01), output=out)
    assert status.success()
    for ux, uy, li in zip(out.step_u(0), out.step_u(1), out.step_l):
        cx, cy = curve(min(1.0, max(0.0, li)))
        assert abs(ux - cx) < 1e-6 and abs(uy - cy) < 1e-6
    np.testing.assert_allclose(np.asarray(u), curve(1.0), atol=1e-8)
