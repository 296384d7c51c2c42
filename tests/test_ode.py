"""ODE solver tests against the reference's golden oracles.

The key validation idea of the reference (SURVEY.md §4.3): exact
comparison with Hairer's Fortran codes — both solution values AND exact
solver-statistics counters (russell_ode/tests/test_radau5_van_der_pol.rs,
test_dopri5_hairer_wanner_eq1.rs).
"""

import numpy as np
import pytest

from russell_tpu.ode import (Method, OdeSolver, Output, Params, StiffnessError,
                             samples)


def test_dopri5_hairer_wanner_eq1_matches_fortran():
    # oracle: dopri5.f counters (test_dopri5_hairer_wanner_eq1.rs:44-52)
    system, x0, y0, args, y_fn = samples.hairer_wanner_eq1()
    params = Params(Method.DOPRI5)
    params.step.h_ini = 1e-4
    sol = OdeSolver(params, system)
    out = Output().set_dense_h_out(0.1).set_dense_recording([0])
    y = sol.solve(y0, x0, 1.5, args=args, output=out)
    st = sol.stats()
    assert abs(float(y[0]) - 9.063921649310544E-02) < 1e-13
    assert abs(float(y[0]) - float(y_fn(1.5, None)[0])) < 4e-5
    assert st.n_function == 235
    assert st.n_steps == 39
    assert st.n_accepted == 39
    assert st.n_rejected == 0
    assert len(out.dense_x()) == 16


def test_radau5_hairer_wanner_eq1_matches_fortran():
    # oracle: radau5.f (test_radau5_hairer_wanner_eq1.rs)
    system, x0, y0, args, y_fn = samples.hairer_wanner_eq1()
    params = Params(Method.RADAU5)
    params.step.h_ini = 1e-4
    sol = OdeSolver(params, system)
    y = sol.solve(y0, x0, 1.5, args=args)
    st = sol.stats()
    assert abs(float(y[0]) - float(y_fn(1.5, None)[0])) < 5e-5
    assert st.n_accepted > 0 and st.n_jacobian >= 1


@pytest.mark.slow
def test_radau5_van_der_pol_matches_fortran():
    # THE parity oracle: all 9 counters of radau5.f must match exactly
    # (test_radau5_van_der_pol.rs:28-56)
    system, x0, y0, x1, args = samples.van_der_pol(1e-6, False)
    params = Params(Method.RADAU5)
    params.step.h_ini = 1e-6
    sol = OdeSolver(params, system)
    out = Output().set_dense_h_out(0.2).set_dense_recording([0, 1])
    y = sol.solve(y0, x0, x1, args=args, output=out)
    st = sol.stats()
    assert abs(float(y[0]) - 1.706163410178079E+00) < 1e-12
    assert abs(float(y[1]) - (-8.927971289301175E-01)) < 1e-11
    assert abs(st.h_accepted - 1.510987221365367E-01) < 1e-6
    assert st.n_function == 2249
    assert st.n_jacobian == 162
    assert st.n_factor == 253
    assert st.n_lin_sol == 668
    assert st.n_steps == 280
    assert st.n_accepted == 242
    assert st.n_rejected == 8
    assert st.n_iterations == 2
    assert st.n_iterations_max == 6


def test_erk_methods_on_kreyszig():
    # all ERK tableaux integrate y' = x + y (Kreyszig Eq.6 p.902)
    for method in Method.erk_methods():
        system, x0, y0, args, y_fn = samples.kreyszig_eq6_page902()
        sol = OdeSolver(Params(method), system)
        y = sol.solve(y0, x0, 1.0, h_equal=0.01, args=args)
        tol = 3e-4 if method.information().order <= 2 else 1e-6
        assert abs(float(y[0]) - float(y_fn(1.0, None)[0])) < tol, method


def test_fweuler_and_bweuler():
    system, x0, y0, args, y_fn = samples.kreyszig_eq6_page902()
    for method in (Method.FW_EULER, Method.BW_EULER):
        sol = OdeSolver(Params(method), system)
        y = sol.solve(y0, x0, 1.0, h_equal=0.001, args=args)
        assert abs(float(y[0]) - float(y_fn(1.0, None)[0])) < 2e-3, method


def test_radau5_mass_matrix_dae():
    # simple_system_with_mass_matrix: y_ana = (cos x, -sin x, ln(1+x))
    system, x0, y0, args, y_fn = samples.simple_system_with_mass_matrix()
    sol = OdeSolver(Params(Method.RADAU5), system)
    y = sol.solve(y0, x0, 20.0, args=args)
    np.testing.assert_allclose(np.asarray(y), y_fn(20.0, None), atol=1e-3)


def test_radau5_amplifier1t_dae():
    # one-transistor amplifier (singular mass matrix): exact radau5.f
    # counters + solution values (test_radau5_amplifier1t.rs:31-73)
    system, x0, y0, args = samples.amplifier1t()
    params = Params(Method.RADAU5)
    params.step.h_ini = 1e-6
    params.set_tolerances(1e-4, 1e-4)
    sol = OdeSolver(params, system)
    y = np.asarray(sol.solve(y0, x0, 0.05, args=args))
    st = sol.stats()
    assert abs(y[0] - (-2.226517868073645E-02)) < 1e-10
    assert abs(y[1] - 3.068700099735197E+00) < 1e-10
    assert abs(y[2] - 2.898340496450958E+00) < 1e-9
    assert abs(y[3] - 2.033525366489690E+00) < 1e-7
    assert abs(y[4] - (-2.269179823457655E+00)) < 1e-7
    assert abs(st.h_accepted - 7.791381954171996E-04) < 1e-6
    assert (st.n_function, st.n_jacobian, st.n_factor, st.n_lin_sol,
            st.n_steps, st.n_accepted, st.n_rejected,
            st.n_iterations_max) == (1511, 126, 166, 461, 166, 127, 6, 5)


def test_brusselator_ode_radau5():
    system, x0, y0, args, y_ref = samples.brusselator_ode()
    params = Params(Method.RADAU5)
    params.set_tolerances(1e-8, 1e-8)
    sol = OdeSolver(params, system)
    y = sol.solve(y0, x0, 20.0, args=args)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


def test_brusselator_ode_dopri8():
    system, x0, y0, args, y_ref = samples.brusselator_ode()
    params = Params(Method.DOPRI8)
    params.set_tolerances(1e-8, 1e-8)
    sol = OdeSolver(params, system)
    y = sol.solve(y0, x0, 20.0, args=args)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-6)


@pytest.mark.slow
def test_brusselator_pde_radau5_small():
    # tiny 2-D brusselator PDE (npoint=5, ndim=50) through the banded LU
    system, t0, yy0, args = samples.brusselator_pde(2e-3, 5)
    params = Params(Method.RADAU5)
    params.set_tolerances(1e-4, 1e-4)
    sol = OdeSolver(params, system)
    y = sol.solve(yy0, t0, 1.0, args=args)
    assert np.all(np.isfinite(np.asarray(y)))
    st = sol.stats()
    assert st.n_accepted > 0 and st.n_factor > 0


def test_dense_output_dopri5():
    system, x0, y0, args, y_fn = samples.kreyszig_eq6_page902()
    sol = OdeSolver(Params(Method.DOPRI5), system)
    out = Output().set_dense_h_out(0.1).set_dense_recording([0])
    sol.solve(y0, x0, 1.0, args=args, output=out)
    xs = out.dense_x()
    ys = out.dense_y(0)
    for x, yv in zip(xs, ys):
        assert abs(yv - float(y_fn(x, None)[0])) < 1e-5


def test_radau5_dense_output():
    system, x0, y0, args, y_fn = samples.hairer_wanner_eq1()
    sol = OdeSolver(Params(Method.RADAU5), system)
    out = Output().set_dense_h_out(0.25).set_dense_recording([0])
    sol.solve(y0, x0, 1.5, args=args, output=out)
    for x, yv in zip(out.dense_x()[1:], out.dense_y(0)[1:]):
        assert abs(yv - float(y_fn(x, None)[0])) < 1e-3


def test_step_output_and_callback_stop():
    system, x0, y0, args, y_fn = samples.kreyszig_eq6_page902()
    sol = OdeSolver(Params(Method.DOPRI5), system)
    out = Output().set_step_recording([0]).set_yx_correct(y_fn)
    sol.solve(y0, x0, 1.0, args=args, output=out)
    assert len(out.step_x) > 2
    assert max(out.step_global_error) < 1e-4

    # graceful stop via callback
    calls = []

    def cb(stats, h, x, y, args):
        calls.append(x)
        return x > 0.5

    sol2 = OdeSolver(Params(Method.DOPRI5), system)
    out2 = Output().set_step_callback(cb)
    sol2.solve(y0, x0, 1.0, args=args, output=out2)
    assert calls[-1] > 0.5 and calls[-1] < 1.0


def test_equal_stepping_counts():
    system, x0, y0, args, y_fn = samples.kreyszig_eq6_page902()
    sol = OdeSolver(Params(Method.RK4), system)
    y = sol.solve(y0, x0, 1.0, h_equal=0.2, args=args)
    st = sol.stats()
    assert st.n_steps == 5
    assert st.n_accepted == 5
    # Kreyszig Table 21.4 p.904: RK4 with h=0.2 reaches ~0.718251
    assert abs(float(y[0]) - 0.718251) < 1e-6


def test_numerical_jacobian_radau5():
    system, x0, y0, x1, args = samples.van_der_pol(1e-3, False)
    params = Params(Method.RADAU5)
    params.newton.use_numerical_jacobian = True
    sol = OdeSolver(params, system)
    y = sol.solve(y0, x0, 0.2, args=args)
    # compare against analytical-jacobian run
    sol2 = OdeSolver(Params(Method.RADAU5), system)
    y2 = sol2.solve(y0, x0, 0.2, args=args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6)


def test_autodiff_jacobian_radau5():
    # no analytical jacobian provided -> jax.jacfwd path
    import jax.numpy as jnp
    from russell_tpu.ode import System
    system = System(2, lambda x, y, args: jnp.stack(
        [y[1], (1.0 - y[0] * y[0]) * y[1] - y[0]]))
    sol = OdeSolver(Params(Method.RADAU5), system)
    y = sol.solve(np.array([2.0, 0.0]), 0.0, 1.0, args=None)
    assert np.all(np.isfinite(np.asarray(y)))


def test_stiffness_detection_dopri5():
    # van der Pol eps=0.003 becomes stiff for DoPri5 (test_dopri5_van_der_pol_debug)
    system, x0, y0, x1, args = samples.van_der_pol(0.003, False)
    params = Params(Method.DOPRI5)
    params.set_tolerances(1e-5, 1e-5)
    params.stiffness.enabled = True
    sol = OdeSolver(params, system)
    with pytest.raises(StiffnessError):
        sol.solve(y0, x0, 2.0, args=args)


@pytest.mark.slow
def test_radau5_fused_matches_fortran_counters():
    # the fused single-computation path must reproduce radau5.f exactly
    system, x0, y0, x1, args = samples.van_der_pol(1e-6, False)
    params = Params(Method.RADAU5)
    params.step.h_ini = 1e-6
    sol = OdeSolver(params, system)
    y = sol.solve(y0, x0, x1, fused=True)
    st = sol.stats()
    assert abs(float(y[0]) - 1.706163410178079E+00) < 1e-12
    assert abs(float(y[1]) - (-8.927971289301175E-01)) < 1e-11
    assert st.n_function == 2249
    assert st.n_jacobian == 162
    assert st.n_factor == 253
    assert st.n_lin_sol == 668
    assert st.n_steps == 280
    assert st.n_accepted == 242
    assert st.n_rejected == 8
    assert st.n_iterations_max == 6


def test_radau5_fused_brusselator_matches_host():
    system, x0, y0, args, y_ref = samples.brusselator_ode()
    params = Params(Method.RADAU5)
    params.set_tolerances(1e-6, 1e-6)
    sol_host = OdeSolver(params, system)
    yh = sol_host.solve(y0, x0, 5.0, args=args)
    sth = sol_host.stats()
    sol_fused = OdeSolver(params, system)
    yf = sol_fused.solve(y0, x0, 5.0, fused=True)
    stf = sol_fused.stats()
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yh), atol=1e-12)
    assert (stf.n_steps, stf.n_accepted, stf.n_function) == \
        (sth.n_steps, sth.n_accepted, sth.n_function)


def test_radau5_fused_dense_output_matches_host():
    # VERDICT r2 item 5: dense stations through the fused device loop
    # must reproduce the host path's collocation interpolation exactly
    system, x0, y0, args, y_ref = samples.brusselator_ode()
    params = Params(Method.RADAU5)
    params.set_tolerances(1e-6, 1e-6)

    sol_host = OdeSolver(params, system)
    out_host = Output().set_dense_h_out(0.31).set_dense_recording([0, 1])
    yh = sol_host.solve(y0, x0, 5.0, args=args, output=out_host)

    sol_fused = OdeSolver(params, system)
    out_fused = Output().set_dense_h_out(0.31).set_dense_recording([0, 1])
    yf = sol_fused.solve(y0, x0, 5.0, output=out_fused, fused=True)

    np.testing.assert_allclose(np.asarray(yf), np.asarray(yh), atol=1e-12)
    assert out_fused.dense_x() == out_host.dense_x()
    for m in (0, 1):
        np.testing.assert_allclose(out_fused.dense_y(m),
                                   out_host.dense_y(m),
                                   rtol=0.0, atol=1e-12)

    # explicit interior stations + post-hoc callback playback
    stations = [0.5, 1.25, 3.0]
    seen = []

    def cb(stats, h, x, y, args):
        seen.append((float(x), float(y[0])))
        return False

    sol2 = OdeSolver(params, system)
    out2 = (Output().set_dense_x_out(stations)
            .set_dense_callback(cb).set_dense_recording([0]))
    sol2.solve(y0, x0, 5.0, output=out2, fused=True)
    assert [x for x, _ in seen] == [0.0] + stations + [5.0]
    sol3 = OdeSolver(params, system)
    out3 = Output().set_dense_x_out(stations).set_dense_recording([0])
    sol3.solve(y0, x0, 5.0, args=args, output=out3)
    np.testing.assert_allclose(out2.dense_y(0), out3.dense_y(0),
                               rtol=0.0, atol=1e-12)


def test_radau5_fused_dae_mass_matrix():
    system, x0, y0, args, y_fn = samples.simple_system_with_mass_matrix()
    params = Params(Method.RADAU5)
    sol = OdeSolver(params, system)
    y = sol.solve(y0, x0, 10.0, fused=True)
    np.testing.assert_allclose(np.asarray(y), y_fn(10.0, None), atol=1e-3)


def test_dopri5_arenstorf_matches_fortran():
    # oracle: dopri5.f on the Arenstorf orbit (test_dopri5_arenstorf.rs)
    system, x0, y0, x1, args, y_ref = samples.arenstorf()
    params = Params(Method.DOPRI5)
    params.step.h_ini = 1e-4
    params.set_tolerances(1e-7, 1e-7)
    sol = OdeSolver(params, system)
    y = sol.solve(y0, x0, x1, args=args)
    st = sol.stats()
    assert abs(float(y[0]) - 9.940021704030663E-01) < 1e-11
    assert abs(float(y[1]) - 9.040891036151961E-06) < 1e-11
    assert abs(float(y[2]) - 1.459758305600828E-03) < 1e-9
    assert abs(float(y[3]) - (-2.001245515834718E+00)) < 1e-9
    assert abs(st.h_accepted - 5.258587607119909E-04) < 1e-10
    assert st.n_function == 1429
    assert st.n_steps == 238
    assert st.n_accepted == 217
    assert st.n_rejected == 21


@pytest.mark.slow
def test_dopri8_van_der_pol_matches_fortran():
    # oracle: dop853.f (test_dopri8_van_der_pol.rs): eps=1e-3,
    # y0=[2,0], dense output h=0.1 (3 extra f evals per accepted step);
    # the reference notes n_function differs by 2 vs pure dop853
    system, _, _, _, args = samples.van_der_pol(1e-3, False)
    params = Params(Method.DOPRI8)
    params.step.h_ini = 1e-6
    params.set_tolerances(1e-9, 1e-9)
    sol = OdeSolver(params, system)
    out = Output().set_dense_h_out(0.1).set_dense_recording([0, 1])
    y = sol.solve(np.array([2.0, 0.0]), 0.0, 2.0, args=args, output=out)
    st = sol.stats()
    assert abs(float(y[0]) - 1.763234540172087E+00) < 1e-13
    assert abs(float(y[1]) - (-8.356886819301910E-01)) < 1e-12
    assert st.n_steps == 1469
    assert st.n_accepted == 1348
    assert st.n_rejected == 121
    assert st.n_function == 21553 - 2


def test_radau5_robertson_matches_fortran():
    # oracle: radau5.f stiff chemistry (test_radau5_robertson.rs)
    system, x0, y0, args = samples.robertson()
    params = Params(Method.RADAU5)
    params.step.h_ini = 1e-6
    params.set_tolerances(1e-8, 1e-2)
    sol = OdeSolver(params, system)
    y = sol.solve(y0, x0, 0.3, args=args)
    st = sol.stats()
    assert abs(float(y[0]) - 9.886740138499884E-01) < 1e-15
    assert abs(float(y[1]) - 3.447720471782070E-05) < 1e-15
    assert abs(float(y[2]) - 1.129150894529390E-02) < 1e-15
    assert abs(st.h_accepted - 8.160578540333708E-01) < 1e-10
    assert st.n_function == 88
    assert st.n_jacobian == 8
    assert st.n_factor == 15
    assert st.n_lin_sol == 24
    assert st.n_steps == 17
    assert st.n_accepted == 15
    assert st.n_rejected == 1


def test_radau5_fused_robertson_matches_fortran():
    # the fused path must reproduce radau5.f exactly THROUGH a rejected
    # step: a retry after reject/divergence recomputes the Jacobian (the
    # host consumes both reuse flags at step start; the fused carry must
    # clear reuse_jac in its reject/diverged branches too)
    system, x0, y0, args = samples.robertson()
    params = Params(Method.RADAU5)
    params.step.h_ini = 1e-6
    params.set_tolerances(1e-8, 1e-2)
    sol = OdeSolver(params, system)
    y = sol.solve(y0, x0, 0.3, args=args, fused=True)
    st = sol.stats()
    assert abs(float(y[0]) - 9.886740138499884E-01) < 1e-15
    assert abs(st.h_accepted - 8.160578540333708E-01) < 1e-10
    assert (st.n_function, st.n_jacobian, st.n_factor, st.n_lin_sol,
            st.n_steps, st.n_accepted, st.n_rejected) == (88, 8, 15, 24,
                                                          17, 15, 1)


def test_radau5_solve_batch():
    # vmapped fused solves: per-lane adaptive paths, exact lane agreement
    system, x0, y0, x1, args = samples.van_der_pol(1e-4, False)
    sol = OdeSolver(Params(Method.RADAU5), system)
    B = 8
    y0s = np.tile(np.asarray(y0)[None, :], (B, 1))
    y0s[:, 0] += np.linspace(-0.2, 0.2, B)
    ys, st = sol.solve_batch(y0s, x0, 1.0)
    assert ys.shape == (B, 2)
    assert np.all(np.asarray(st["status"]) == 1)
    # lanes took different step counts (independent controllers)
    assert len(set(np.asarray(st["n_accepted"]).tolist())) > 1
    y_ref = sol.solve(y0s[3], x0, 1.0, fused=True)
    np.testing.assert_allclose(np.asarray(ys[3]), np.asarray(y_ref),
                               atol=1e-12)


def test_erk_fused_matches_host_counters():
    # the fused whole-integration ERK path must reproduce the host
    # controller exactly (counters are the dopri5.f/dop853.f contract)
    for method in (Method.DOPRI5, Method.DOPRI8, Method.FEHLBERG4,
                   Method.VERNER6):
        system, x0, y0, args, _ = samples.hairer_wanner_eq1()
        params = Params(method)
        params.step.h_ini = 1e-4
        host = OdeSolver(params, system)
        yh = host.solve(y0, x0, 2.0)
        ph = Params(method)
        ph.step.h_ini = 1e-4
        fused = OdeSolver(ph, system)
        yf = fused.solve(y0, x0, 2.0, fused=True)
        sh, sf = host.stats(), fused.stats()
        for k in ("n_function", "n_steps", "n_accepted", "n_rejected"):
            assert getattr(sh, k) == getattr(sf, k), (method, k)
        assert abs(sh.h_accepted - sf.h_accepted) < 1e-8
        assert np.max(np.abs(np.asarray(yh) - np.asarray(yf))) < 1e-10


def test_erk_fused_solve_batch():
    # vmapped fused DoPri5: ensemble of initial conditions in one launch
    system, x0, y0, args, _ = samples.hairer_wanner_eq1()
    params = Params(Method.DOPRI5)
    params.step.h_ini = 1e-4
    sol = OdeSolver(params, system)
    y0s = np.linspace(0.5, 2.0, 8)[:, None] * np.asarray(y0)[None, :]
    yb, st = sol.solve_batch(y0s, x0, 1.5)
    assert yb.shape == (8, 1)
    assert bool(np.all(np.asarray(st["status"]) == 1))
    # lanes must match scalar fused solves
    y_ref = sol.solve(y0s[5], x0, 1.5, fused=True)
    assert np.max(np.abs(np.asarray(yb[5]) - np.asarray(y_ref))) < 1e-12


def test_radau5_fused_chunked_matches_unchunked():
    # chunked device calls (TPU watchdog workaround) must be bit-identical
    import jax.numpy as jnp
    from russell_tpu.ode.radau5_fused import build_fused_solver
    system, x0, y0, args, _ = samples.hairer_wanner_eq1()
    params = Params(Method.RADAU5)
    params.set_tolerances(1e-4, 1e-4)
    sol = OdeSolver(params, system)
    h0 = min(params.step.h_ini, 1.5 - x0)
    fn_un = build_fused_solver(sol.actual, params, chunk=0)
    fn_ch = build_fused_solver(sol.actual, params, chunk=3)
    ya, sa = fn_un(jnp.float64(x0), jnp.asarray(y0), jnp.float64(1.5),
                   jnp.float64(h0))
    yb, sb = fn_ch(jnp.float64(x0), jnp.asarray(y0), jnp.float64(1.5),
                   jnp.float64(h0))
    assert np.array_equal(np.asarray(ya), np.asarray(yb))
    for k in sa:
        assert float(np.asarray(sa[k])) == float(np.asarray(sb[k])), k


def test_radau5_fused_brusselator_gridmf_matches_banded():
    """Radau5 driving the GRIDMF multifrontal backend (the npoint=513
    headline configuration) must match the BANDED backend exactly:
    same counters, solutions equal to fp noise. Exercises the complex
    plane-pair GRIDMF factorization inside the fused loop."""
    from russell_tpu.sparse.enums import Genie

    res = {}
    for genie in (Genie.GRIDMF, Genie.BANDED):
        system, t0, y0, args = samples.brusselator_pde(2e-3, 16)
        params = Params(Method.RADAU5)
        params.set_tolerances(1e-4, 1e-4)
        params.newton.genie = genie
        sol = OdeSolver(params, system)
        y = np.asarray(sol.solve(y0, t0, 1.0, args=None, fused=True))
        res[genie] = (y, sol.stats())
    yg, sg = res[Genie.GRIDMF]
    yb, sb = res[Genie.BANDED]
    for k in ("n_function", "n_jacobian", "n_factor", "n_lin_sol",
              "n_steps", "n_accepted", "n_rejected"):
        assert getattr(sg, k) == getattr(sb, k), k
    assert np.max(np.abs(yg - yb)) < 1e-12


def test_radau5_robertson_small_h_failure_counters():
    # loose tolerances drive h below the minimum: the failure path must
    # also match radau5.f exactly (test_radau5_robertson_small_h.rs)
    system, x0, y0, args = samples.robertson()
    params = Params(Method.RADAU5)
    params.step.h_ini = 1e-6
    params.set_tolerances(1e-2, 1e-2)
    sol = OdeSolver(params, system)
    with pytest.raises(RuntimeError, match="stepsize becomes too small"):
        sol.solve(y0, x0, 0.3, args=args)
    st = sol.stats()
    assert (st.n_function, st.n_jacobian, st.n_factor, st.n_lin_sol,
            st.n_steps, st.n_accepted, st.n_rejected,
            st.n_iterations_max) == (520, 57, 75, 153, 75, 60, 4, 4)


def test_bweuler_hairer_wanner_counters():
    # fixed-step backward Euler vs the reference's recorded run
    # (test_bweuler.rs:25-43)
    system, x0, y0, args, _yfn = samples.hairer_wanner_eq1()
    sol = OdeSolver(Params(Method.BW_EULER), system)
    y = np.asarray(sol.solve(y0, x0, 1.5, args=args, h_equal=1.875 / 50.0))
    st = sol.stats()
    assert abs(y[0] - 0.09060476604187756) < 1e-15
    assert (st.n_function, st.n_jacobian, st.n_factor, st.n_lin_sol,
            st.n_steps, st.n_accepted, st.n_rejected,
            st.n_iterations_max) == (80, 40, 40, 40, 40, 40, 0, 2)


def test_mdeuler_hairer_wanner_counters():
    # modified-Euler embedded pair (test_mdeuler.rs:25-41)
    system, x0, y0, args, y_fn = samples.hairer_wanner_eq1()
    params = Params(Method.MD_EULER)
    params.step.h_ini = 1e-4
    sol = OdeSolver(params, system)
    y = np.asarray(sol.solve(y0, x0, 1.5, args=args))
    st = sol.stats()
    assert abs(y[0] - 0.09062475637905158) < 1e-16
    assert abs(y[0] - float(y_fn(1.5, None)[0])) < 1e-4
    assert (st.n_function, st.n_jacobian, st.n_factor, st.n_lin_sol,
            st.n_steps, st.n_accepted,
            st.n_rejected) == (424, 0, 0, 0, 212, 212, 0)


def test_radau5_brusselator_pde_n9_matches_mathematica():
    # 2-D Brusselator PDE at npoint=9 vs NDSolve reference values
    # (test_radau5_brusselator_pde.rs:10-44)
    import json
    import os
    path = ("/root/reference/russell_ode/data/reference/"
            "brusselator_pde_2d_n9_mathematica.json")
    if not os.path.exists(path):
        pytest.skip("reference data not available")
    npoint = 9
    system, t0, yy0, args = samples.brusselator_pde(2e-3, npoint)
    params = Params(Method.RADAU5)
    params.set_tolerances(1e-3, 1e-3)
    sol = OdeSolver(params, system)
    y = np.asarray(sol.solve(yy0, t0, 0.1, args=args))
    assert sol.stats().n_function == 24
    math = json.load(open(path))
    ij = (npoint - 1) // 2
    m = ij + ij * npoint
    s = npoint * npoint
    assert abs(y[m] - math["uu"][ij][ij]) < 1e-7
    assert abs(y[s + m] - math["vv"][ij][ij]) < 1e-7


def test_erk_fused_dense_output_matches_host():
    # VERDICT r3 item 8: dense stations through the fused DoPri5/DoPri8
    # device loop must reproduce the host ErkDenseOut stream exactly —
    # including DoPri8's +3 function evaluations per accepted step
    from russell_tpu.ode import Output
    for method in (Method.DOPRI5, Method.DOPRI8):
        system, x0, y0, args, _ = samples.hairer_wanner_eq1()
        params = Params(method)
        params.step.h_ini = 1e-4
        sol_host = OdeSolver(params, system)
        out_host = Output().set_dense_h_out(0.23).set_dense_recording([0])
        yh = sol_host.solve(y0, x0, 2.0, output=out_host)

        ph = Params(method)
        ph.step.h_ini = 1e-4
        sol_fused = OdeSolver(ph, system)
        out_fused = Output().set_dense_h_out(0.23).set_dense_recording([0])
        yf = sol_fused.solve(y0, x0, 2.0, output=out_fused, fused=True)

        sh, sf = sol_host.stats(), sol_fused.stats()
        for k in ("n_function", "n_steps", "n_accepted", "n_rejected"):
            assert getattr(sh, k) == getattr(sf, k), (method, k)
        assert out_fused.dense_x() == out_host.dense_x()
        # association-order noise only (fused folds (h*a)*k, host
        # h*(sum a*k)): identical step sequence, identical counters
        np.testing.assert_allclose(out_fused.dense_y(0),
                                   out_host.dense_y(0),
                                   rtol=0.0, atol=1e-10)
        assert np.max(np.abs(np.asarray(yh) - np.asarray(yf))) < 1e-10
