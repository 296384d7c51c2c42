"""Algorithm-module tests (mirrors russell_lab/src/algo test strategy)."""

import math

import numpy as np
import pytest

from russell_tpu.algo import (Bspline, InterpChebyshev, InterpGrid,
                              InterpLagrange, InterpParams, LineSearcher,
                              MinBracketing, MinSolver, NewtonSolver,
                              Quadrature, RootFinder, get_test_functions,
                              linear_fitting, num_jacobian, solve_cubic)


def test_interp_lagrange_basics():
    # interp_lagrange.rs doc example: y = x^2 at CGL points
    interp = InterpLagrange(3)
    xx = interp.get_points()
    uu = xx ** 2
    assert float(interp.eval(0.5, uu)) == pytest.approx(0.25, abs=1e-14)
    assert interp.eval_deriv1(0.5, uu) == pytest.approx(1.0, abs=1e-13)
    assert interp.eval_deriv2(0.5, uu) == pytest.approx(2.0, abs=1e-12)
    # psi is a cardinal basis
    for j in range(4):
        for k in range(4):
            assert interp.psi(j, float(xx[k])) == pytest.approx(
                1.0 if j == k else 0.0, abs=1e-13)


def test_interp_lagrange_d1_uniform_degree2():
    # interp_lagrange.rs:820 doc: exact D1 for degree 2 uniform grid
    params = InterpParams(grid_type=InterpGrid.UNIFORM,
                          no_eta_normalization=True)
    interp = InterpLagrange(2, params)
    interp.calc_dd1_matrix()
    correct = np.array([[-1.5, 2.0, -0.5], [-0.5, 0.0, 0.5],
                        [0.5, -2.0, 1.5]])
    np.testing.assert_allclose(interp.get_dd1(), correct, atol=1e-14)
    # D2 == D1 @ D1 for this case (interp_lagrange.rs:905 doc)
    interp.calc_dd2_matrix()
    np.testing.assert_allclose(interp.get_dd2(),
                               interp.get_dd1() @ interp.get_dd1(),
                               atol=1e-13)


def test_interp_lagrange_spectral_accuracy():
    # runge function with CGL grid, N=40: error < 1e-8
    interp = InterpLagrange(40)
    f = lambda x, a: 1.0 / (1.0 + 16.0 * x * x)
    assert interp.estimate_max_error(f) < 1e-4
    interp2 = InterpLagrange(100)
    assert interp2.estimate_max_error(f) < 1e-10
    # differentiation matrix on sin: D1 u ~ cos
    interp3 = InterpLagrange(24)
    interp3.calc_dd1_matrix()
    xx = interp3.get_points()
    du = interp3.get_dd1() @ np.sin(xx)
    np.testing.assert_allclose(du, np.cos(xx), atol=1e-12)


def test_interp_lagrange_eta_normalization_large_n():
    # large N would overflow the plain product; eta path must stay finite
    interp = InterpLagrange(800)
    assert np.all(np.isfinite(interp.get_lambda()))
    assert interp.estimate_lebesgue_constant() < 20.0  # CGL grows log N


def test_interp_chebyshev_adapt():
    # interp_chebyshev.rs doc: f(x) = x^2 - 1 adapts to degree 2
    interp = InterpChebyshev(10, -4.0, 4.0)
    interp.adapt_function(1e-8, lambda x, a: x * x - 1.0)
    assert interp.get_degree() == 2
    assert float(interp.eval(0.0)) == pytest.approx(-1.0, abs=1e-14)
    assert float(interp.eval_using_trig(1.5)) == pytest.approx(
        1.25, abs=1e-13)
    # data fitting (interp_chebyshev.rs:450 doc): linear data -> degree 1
    interp2 = InterpChebyshev(10, 0.0, 1.0)
    interp2.adapt_data(1e-8, [-7.0, -4.5, 0.5, 3.0])
    assert interp2.get_degree() == 1


def test_interp_chebyshev_set_data():
    nn = 2
    zz = InterpChebyshev.points(nn)
    xa, xb = -4.0, 4.0
    uu = ((xb + xa + (xb - xa) * zz) / 2.0) ** 2 - 1.0
    interp = InterpChebyshev(nn, xa, xb)
    interp.set_data(uu)
    assert float(interp.eval(0.0)) == pytest.approx(-1.0, abs=1e-14)


def test_root_finder_chebyshev():
    # root_finder.rs doc: x^2 - 1 on [-4, 4]
    interp = InterpChebyshev(2, -4.0, 4.0)
    interp.set_function(2, lambda x, a: x * x - 1.0)
    solver = RootFinder()
    roots = solver.chebyshev(interp)
    np.testing.assert_allclose(roots, [-1.0, 1.0], atol=1e-13)
    # refine inaccurate estimates (root_finder.rs:258 doc)
    interp2 = InterpChebyshev(2, -2.0, 2.0)
    interp2.set_function(2, lambda x, a: x ** 4 - 1.0)
    roots2 = solver.chebyshev(interp2)
    solver.refine(roots2, -2.0, 2.0, lambda x, a: x ** 4 - 1.0)
    np.testing.assert_allclose(roots2, [-1.0, 1.0], atol=1e-13)


def test_root_finder_brent():
    solver = RootFinder()
    root = solver.brent(2.0, 4.0, lambda x, a: math.sin(x))
    assert root == pytest.approx(math.pi, abs=1e-12)
    with pytest.raises(ValueError):
        solver.brent(0.0, 1.0, lambda x, a: x + 2.0)


def test_root_finder_on_corpus():
    solver = RootFinder()
    for tf in get_test_functions():
        if tf.root1 is None:
            continue
        interp = InterpChebyshev(100, tf.range_a, tf.range_b)
        interp.adapt_function(1e-9, tf.f)
        roots = solver.chebyshev(interp)
        solver.refine(roots, tf.range_a, tf.range_b, tf.f)
        expected = [r for r in (tf.root1, tf.root2, tf.root3)
                    if r is not None]
        assert len(roots) >= len(expected), tf.name
        for r in expected:
            assert min(abs(rr - r) for rr in roots) < 1e-9, tf.name


def test_min_bracketing_and_solver():
    f = lambda x, a: (x - 2.0) ** 2 + 1.0
    br = MinBracketing().basic(0.0, f)
    assert br.a < 2.0 < br.c and br.fb < br.fa and br.fb < br.fc
    xmin = MinSolver().brent(br.a, br.c, f)
    assert xmin == pytest.approx(2.0, abs=1e-8)


def test_line_search():
    # minimize f(x)=x^2 from x=1 along p=-1
    f = lambda x, a: x * x
    t = LineSearcher().search(1.0, -1.0, 1.0, -2.0, f)
    assert 0.0 < t <= 1.0
    assert f(1.0 - t, None) < 1.0


def test_quadrature():
    quad = Quadrature()
    area = quad.integrate(-1.0, 1.0, lambda x, a: math.sqrt(1.0 - x * x))
    assert area == pytest.approx(math.pi / 2.0, abs=1e-10)
    v = quad.integrate(0.0, 1.0, lambda x, a: math.exp(x))
    assert v == pytest.approx(math.e - 1.0, rel=1e-12)
    for tf in get_test_functions():
        if tf.integral is None:
            continue
        v = quad.integrate(tf.range_a, tf.range_b, tf.f)
        assert v == pytest.approx(tf.integral, abs=1e-9), tf.name
    with pytest.raises(ValueError):
        quad.integrate(1.0, 1.0, lambda x, a: x)


def test_newton_solver():
    import jax.numpy as jnp
    # F(u) = [u0^2 + u1 - 3, u0 - u1 + 1] -> root (1, 2)
    f = lambda x, u, a: jnp.stack([u[0] ** 2 + u[1] - 3.0,
                                   u[0] - u[1] + 1.0])
    solver = NewtonSolver(2)
    u = solver.solve(np.array([2.0, 0.0]), f)
    np.testing.assert_allclose(np.asarray(u), [1.0, 2.0], atol=1e-9)
    solver2 = NewtonSolver(2)
    solver2.use_numerical_jacobian = True
    u2 = solver2.solve(np.array([2.0, 0.0]), f)
    np.testing.assert_allclose(np.asarray(u2), [1.0, 2.0], atol=1e-8)


def test_num_jacobian():
    f = lambda x, u, a: np.array([u[0] ** 2, u[0] * u[1]])
    J = num_jacobian(f, 0.0, np.array([2.0, 3.0]))
    np.testing.assert_allclose(J, [[4.0, 0.0], [3.0, 2.0]], atol=1e-6)


def test_linear_fitting():
    # linear_fitting.rs doc-style
    x = [0.0, 1.0, 2.0, 3.0]
    y = [1.0, 3.0, 5.0, 7.0]
    c, m = linear_fitting(x, y)
    assert c == pytest.approx(1.0, abs=1e-14)
    assert m == pytest.approx(2.0, abs=1e-14)
    c0, m0 = linear_fitting(x, y, pass_through_zero=True)
    assert c0 == 0.0


def test_solve_cubic():
    # three real roots: (x-1)(x-2)(x-3)
    roots = solve_cubic(1.0, -6.0, 11.0, -6.0)
    np.testing.assert_allclose(roots, [1.0, 2.0, 3.0], atol=1e-10)
    # one real root: x^3 + x + 1
    roots = solve_cubic(1.0, 0.0, 1.0, 1.0)
    assert len(roots) == 1
    assert roots[0] == pytest.approx(-0.6823278038280193, abs=1e-12)
    # double root: (x-1)^2 (x-4) = x^3 -6x^2 +9x -4
    roots = solve_cubic(1.0, -6.0, 9.0, -4.0)
    np.testing.assert_allclose(roots, [1.0, 4.0], atol=1e-7)
    with pytest.raises(ValueError):
        solve_cubic(0.0, 1.0, 1.0, 1.0)


def test_bspline():
    # quadratic B-spline with clamped knot vector on [0, 1]
    p = 2
    uu = [0.0, 0.0, 0.0, 0.5, 1.0, 1.0, 1.0]
    bs = Bspline(p, uu)
    assert bs.num_basis() == 4
    # partition of unity + match recursive evaluation
    for u in (0.0, 0.25, 0.5, 0.75, 0.999):
        bs.calc_basis(u)
        vals = [bs.get_basis(i) for i in range(4)]
        assert sum(vals) == pytest.approx(1.0, abs=1e-14)
        rec = [bs.recursive_basis(u, i) for i in range(4)]
        np.testing.assert_allclose(vals, rec, atol=1e-14)
    # curve through control points: endpoints interpolated (clamped)
    ctrl = np.array([[0.0, 0.0], [0.5, 1.0], [1.5, 1.0], [2.0, 0.0]])
    bs.set_control_points(ctrl)
    np.testing.assert_allclose(bs.calc_point(0.0), ctrl[0], atol=1e-14)
    np.testing.assert_allclose(bs.calc_point(1.0), ctrl[-1], atol=1e-14)
    # derivative vs finite difference
    d = bs.calc_curve_derivs(0.3, 1)
    h = 1e-7
    fd = (bs.calc_point(0.3 + h) - bs.calc_point(0.3 - h)) / (2 * h)
    np.testing.assert_allclose(d[1], fd, atol=1e-5)
