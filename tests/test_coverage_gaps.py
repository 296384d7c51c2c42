"""Depth tests for modules the coverage report flagged lowest
(tools/coverage_report.py baseline 86.17%): python ordering fallbacks,
sparse numerical_jacobian, table readers, nonlin Logger, tensor
derivative functions, Chebyshev/Legendre derivative helpers,
formatters, small sorters.

Oracles: scipy/numpy independents, jax.grad for analytic derivatives
(the reference validates analytical derivatives the same way with its
check::deriv1_approx_eq framework, russell_lab/src/check/).
"""

import io
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest


# ---------------------------------------------------------------- ordering

def test_ordering_python_fallbacks(monkeypatch):
    # force the pure-python paths (the C++ engine normally shadows them)
    from russell_tpu import native
    from russell_tpu.sparse import samples
    from russell_tpu.sparse.ordering import (bandwidth, mindeg_ordering,
                                             nd_ordering, rcm_ordering)
    monkeypatch.setattr(native, "rcm_order", lambda *a, **k: None)
    monkeypatch.setattr(native, "nd_order", lambda *a, **k: None)
    monkeypatch.setattr(native, "mindeg_order", lambda *a, **k: None)
    coo = samples.laplacian_2d(20)
    ii, jj, _ = map(np.asarray, coo.triplets())
    n = coo.nrow
    perm = rcm_ordering(n, ii, jj)
    assert sorted(perm) == list(range(n))
    assert bandwidth(ii, jj, perm) <= bandwidth(ii, jj)
    pm = mindeg_ordering(n, ii, jj)
    assert sorted(pm) == list(range(n))
    out = nd_ordering(n, ii, jj, leaf=16)
    pnd = out[0] if isinstance(out, tuple) else out
    assert sorted(np.asarray(pnd).tolist()) == list(range(n))


def test_ordering_nd_with_regions_fallback(monkeypatch):
    from russell_tpu import native
    from russell_tpu.sparse import samples
    from russell_tpu.sparse.ordering import nd_ordering
    monkeypatch.setattr(native, "nd_order", lambda *a, **k: None)
    coo = samples.laplacian_2d(12)
    ii, jj, _ = map(np.asarray, coo.triplets())
    out = nd_ordering(coo.nrow, ii, jj, leaf=8, with_regions=True)
    perm, regions = out
    assert sorted(np.asarray(perm).tolist()) == list(range(coo.nrow))
    assert len(regions) >= 1


# --------------------------------------------------- numerical jacobian

def test_sparse_numerical_jacobian_matches_analytic():
    from russell_tpu.sparse.numerical_jacobian import (jacobian_values,
                                                       numerical_jacobian)

    def f(x, y, _args=None):
        return jnp.asarray([2.0 * y[0] + jnp.sin(y[1]) * x,
                            y[0] * y[1],
                            -y[2] ** 2])

    rows = np.asarray([0, 0, 1, 1, 2])
    cols = np.asarray([0, 1, 0, 1, 2])
    x = 0.7
    y = jnp.asarray([0.4, 1.1, -0.6])
    alpha = 2.5
    vals = np.asarray(numerical_jacobian(alpha, x, y, f, rows, cols))
    J = np.asarray(jax.jacfwd(lambda yy: f(x, yy))(y))
    expect = alpha * J[rows, cols]
    assert np.max(np.abs(vals - expect)) < 1e-6
    vals2 = np.asarray(jacobian_values(alpha, x, y, f, rows, cols))
    assert np.max(np.abs(vals2 - expect)) < 1e-6


# ----------------------------------------------------------- read_table

def test_read_table_with_labels_and_errors(tmp_path):
    from russell_tpu.core import read_data, read_table
    p = tmp_path / "t.txt"
    p.write_text("a b c\n1 2 3\n4 5 6\n")
    t = read_table(str(p), labels=["a", "b", "c"])
    assert np.allclose(t["c"], [3.0, 6.0])
    with pytest.raises(Exception):
        read_table(str(p), labels=["a", "b"])      # label mismatch
    q = tmp_path / "bad.txt"
    q.write_text("x y\n1 2\n3\n")                  # ragged row
    with pytest.raises(Exception):
        read_data(str(q))
    e = tmp_path / "empty.txt"
    e.write_text("# only comments\n")
    with pytest.raises(Exception):
        read_table(str(e))


# -------------------------------------------------------------- logger

def test_nonlin_logger_table_output(capsys):
    from russell_tpu.nonlin import (Config, DeltaLambda, IniDir, Method,
                                    Solver, Stop, samples)

    system, u0, l0 = samples.circle_ul(1.0)
    config = Config(method=Method.ARCLENGTH)
    config.verbose = True
    config.verbose_header_footer = True
    config.verbose_iterations = True
    solver = Solver(config, system)
    u, l, status = solver.solve(u0, l0, IniDir.NEG, Stop.steps(10),
                                DeltaLambda.constant(0.05))
    text = "\n".join(solver.log.lines())
    assert "lambda" in text and "status" in text
    assert "continuation" in text
    out = capsys.readouterr().out
    assert "lambda" in out   # verbose printed to stdout too


# -------------------------------------------------- tensor derivatives

def test_tensor_derivative_functions_vs_jax_grad():
    from russell_tpu.tensor import (Mandel, Tensor2, derivatives)
    rng = np.random.default_rng(0)
    m = rng.normal(size=(3, 3))
    sym = (m + m.T) / 2 + np.eye(3) * 3.0
    t = Tensor2.from_matrix(sym, Mandel.SYMMETRIC)

    def inv(fn_name):
        def f(v):
            tt = Tensor2(Mandel.SYMMETRIC, v)
            return getattr(tt, fn_name)()
        return f

    for deriv_fn, inv_name in [
            (derivatives.deriv1_invariant_ii1, "invariant_ii1"),
            (derivatives.deriv1_invariant_ii2, "invariant_ii2"),
            (derivatives.deriv1_invariant_jj2, "invariant_jj2"),
            (derivatives.deriv1_invariant_jj3, "invariant_jj3"),
            (derivatives.deriv1_invariant_sigma_m, "invariant_sigma_m"),
            (derivatives.deriv1_invariant_sigma_d, "invariant_sigma_d")]:
        d = deriv_fn(t)
        g = jax.grad(inv(inv_name))(t.vec)
        assert np.allclose(np.asarray(d.vec), np.asarray(g),
                           atol=1e-10), inv_name

    d2 = derivatives.deriv2_invariant_jj2(t)
    H = jax.hessian(inv("invariant_jj2"))(t.vec)
    assert np.allclose(np.asarray(d2.mat), np.asarray(H), atol=1e-10)

    dinv = derivatives.deriv_inverse_tensor(t)
    J = jax.jacfwd(
        lambda v: Tensor2(Mandel.SYMMETRIC, v).inverse().vec)(t.vec)
    assert np.allclose(np.asarray(dinv.mat), np.asarray(J), atol=1e-10)

    dsq = derivatives.deriv_squared_tensor(t)
    J2 = jax.jacfwd(
        lambda v: Tensor2(Mandel.SYMMETRIC, v).squared().vec)(t.vec)
    assert np.allclose(np.asarray(dsq.mat), np.asarray(J2), atol=1e-10)


# ------------------------------------------- chebyshev/legendre derivs

def test_chebyshev_legendre_derivative_helpers():
    from russell_tpu.math import (chebyshev_tn, chebyshev_tn_deriv1,
                                  chebyshev_tn_deriv2, chebyshev_un,
                                  chebyshev_un_deriv1, chebyshev_un_deriv2)
    from russell_tpu.math.legendre import (legendre_gauss_points,
                                           legendre_gauss_weights,
                                           legendre_lobatto_points,
                                           legendre_lobatto_weights,
                                           legendre_pn, legendre_pn_deriv1,
                                           legendre_pn_deriv2)
    # interior points only: jax.grad of the acos-form reference goes
    # NaN at |x|=1; endpoint identities checked separately below
    for n in (0, 1, 2, 5, 8):
        for x in (-0.9, -0.3, 0.0, 0.55, 0.97):
            for fn, dfn in ((chebyshev_tn, chebyshev_tn_deriv1),
                            (chebyshev_un, chebyshev_un_deriv1),
                            (legendre_pn, legendre_pn_deriv1)):
                g = jax.grad(lambda xx: fn(n, xx))(jnp.asarray(x))
                assert abs(float(dfn(n, x)) - float(g)) < 1e-9, (fn, n, x)
            for fn, d2 in ((chebyshev_tn, chebyshev_tn_deriv2),
                           (chebyshev_un, chebyshev_un_deriv2),
                           (legendre_pn, legendre_pn_deriv2)):
                h = jax.grad(jax.grad(lambda xx: fn(n, xx)))(jnp.asarray(x))
                assert abs(float(d2(n, x)) - float(h)) < 1e-8, (fn, n, x)
    # endpoint identity: T_n'(1) = n^2, U_{n}'(1) = n(n+1)(n+2)/3
    for n in (0, 1, 3, 6):
        assert abs(float(chebyshev_tn_deriv1(n, 1.0)) - n * n) < 1e-9
        assert abs(float(chebyshev_un_deriv1(n, 1.0))
                   - n * (n + 1) * (n + 2) / 3.0) < 1e-8
    # quadrature identities: sum w_i = 2, integrate x^2 exactly
    for pts_fn, w_fn in ((legendre_gauss_points, legendre_gauss_weights),
                         (legendre_lobatto_points,
                          legendre_lobatto_weights)):
        xs = np.asarray(pts_fn(6))
        ws = np.asarray(w_fn(6))
        assert abs(ws.sum() - 2.0) < 1e-12
        assert abs((ws * xs ** 2).sum() - 2.0 / 3.0) < 1e-12


# ------------------------------------------------- formatters + sorters

def test_formatters_and_small_sorters():
    from russell_tpu.core import (format_fortran, format_scientific,
                                  sort2, sort3, sort4)
    from russell_tpu.dense import vec_fmt_scientific
    assert format_fortran(0.0).strip() in ("0.00000000000000E+00",
                                           "0.000000000000000E+00")
    s = format_fortran(-1234.5678)
    assert "E" in s and s.lstrip().startswith("-")
    assert "E" in format_scientific(6.0221e23, 23, 15)
    assert "E" in format_scientific(0.0, 10, 3)
    txt = vec_fmt_scientific(np.asarray([1.0, -2.5e-8]), 3)
    assert "1.000E" in txt.upper() or "1.000e" in txt
    assert sort2(2.0, 1.0) == (1.0, 2.0)
    assert sort3(3.0, 1.0, 2.0) == (1.0, 2.0, 3.0)
    assert sort4(4.0, 3.0, 2.0, 1.0) == (1.0, 2.0, 3.0, 4.0)
    assert sort4(1.0, 2.0, 3.0, 4.0) == (1.0, 2.0, 3.0, 4.0)


# ------------------------------------------------- transfinite 3-D

def test_transfinite_3d_unit_cube_identity():
    from russell_tpu.pde import Transfinite3d
    import numpy as np

    # 6 faces of the reference cube itself: the Coons volume must be the
    # identity map (transfinite_3d.rs role)
    faces = [
        lambda b, g: np.array([-1.0, b, g]),   # xmin
        lambda b, g: np.array([+1.0, b, g]),   # xmax
        lambda a, g: np.array([a, -1.0, g]),   # ymin
        lambda a, g: np.array([a, +1.0, g]),   # ymax
        lambda a, b: np.array([a, b, -1.0]),   # zmin
        lambda a, b: np.array([a, b, +1.0]),   # zmax
    ]
    tr = Transfinite3d(faces)
    for a in (-1.0, -0.3, 0.5, 1.0):
        for b in (-1.0, 0.2, 1.0):
            for g in (-0.7, 0.0, 1.0):
                x = np.asarray(tr.point(a, b, g))
                assert np.allclose(x, [a, b, g], atol=1e-14), (a, b, g)


def test_transfinite_3d_bad_faces():
    from russell_tpu.pde import Transfinite3d
    with pytest.raises(ValueError):
        Transfinite3d([lambda a, b: (a, b, 0.0)] * 5)


# ---------------------------------------------------- ode Output JSON

def test_ode_output_json_roundtrip_and_yx_correct(tmp_path):
    from russell_tpu.ode import Method, OdeSolver, Output, Params
    from russell_tpu.ode.output import OutCount, OutData
    from russell_tpu.ode import samples

    system, x0, y0, args, y_fn = samples.hairer_wanner_eq1()
    params = Params(Method.DOPRI5)
    params.set_tolerances(1e-8, 1e-8)
    out = Output()
    out.set_dense_h_out(0.25)
    out.set_dense_recording([0])
    out.set_dense_file_writing(str(tmp_path / "run"))
    out.set_yx_correct(lambda x: y_fn(x, None))
    solver = OdeSolver(params, system)
    solver.solve(y0, x0, 1.0, args=None, output=out)
    xs = out.dense_x()
    assert len(xs) >= 3 and abs(xs[1] - xs[0] - 0.25) < 1e-12
    # files written: count + one OutData per station
    cnt = OutCount.read_json(str(tmp_path / "run_count.json"))
    assert cnt.n == len(xs)
    d0 = OutData.read_json(str(tmp_path / "run_0.json"))
    assert abs(d0.x - xs[0]) < 1e-12
    # roundtrip
    p = tmp_path / "one.json"
    d0.write_json(str(p))
    d1 = OutData.read_json(str(p))
    assert d1.x == d0.x and list(d1.y) == list(d0.y)
