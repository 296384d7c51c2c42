"""PDE tests: FDM vs SPC on the same analytic problems (the reference's
cross-validation strategy, e.g. tests/test_2d_prob01_{fdm,spc}.rs)."""

import math

import numpy as np
import pytest

from russell_tpu.pde import (EquationHandler, EssentialBcs1d, EssentialBcs2d,
                             Fdm1d, Fdm2d, Grid1d, Grid2d, Metrics,
                             NaturalBcs1d, NaturalBcs2d, Side, Spc1d, Spc2d,
                             SpcMap2d, Transfinite2d, problem_samples)


def _max_err_2d(solver, a, analytical):
    err = 0.0

    def cb(m, x, y):
        nonlocal err
        err = max(err, abs(a[m] - analytical(x, y)))

    solver.for_each_coord(cb)
    return err


def _max_err_1d(solver, a, analytical):
    err = 0.0

    def cb(m, x):
        nonlocal err
        err = max(err, abs(a[m] - analytical(x)))

    solver.for_each_coord(cb)
    return err


def test_grid_2d():
    g = Grid2d.new_uniform(0.0, 1.0, 0.0, 2.0, 3, 4)
    assert g.size() == 12
    assert g.get_m(1, 2) == 7
    assert g.get_ij(7) == (1, 2)
    assert g.is_xmin(0) and g.is_ymax(9)
    assert g.is_corner(0) and g.is_corner(11) and not g.is_corner(1)
    assert g.get_dx_dy() == (0.5, 2.0 / 3.0)
    cgl = Grid2d.new_chebyshev_gauss_lobatto(5, 5)
    assert cgl.is_chebyshev_gauss_lobatto()
    assert cgl.xmin() == -1.0 and cgl.xmax() == 1.0


def test_equation_handler():
    eq = EquationHandler(6)
    assert eq.nu() == 6 and eq.np() == 0
    eq.recompute([1, 4, 4])
    assert eq.nu() == 4 and eq.np() == 2
    assert eq.is_prescribed(1) and eq.is_unknown(0)
    assert eq.iu(0) == 0 and eq.iu(2) == 1
    assert eq.ip(4) == 1
    assert eq.unknown() == [0, 2, 3, 5]
    assert eq.prescribed() == [1, 4]
    with pytest.raises(ValueError):
        eq.iu(1)


def test_fdm_1d_problem_01():
    xmin, xmax, kx, ebcs, nbcs, src, ana, flow = \
        problem_samples.d1_problem_01()
    grid = Grid1d.new_uniform(xmin, xmax, 81)
    fdm = Fdm1d(grid, ebcs, nbcs, kx)
    a = fdm.solve_sps(0.0, src)
    assert _max_err_1d(fdm, a, ana) < 2e-5
    a2 = fdm.solve_lmm(0.0, src)
    np.testing.assert_allclose(a2, a, atol=1e-10)


def test_fdm_1d_helmholtz_rod():
    xmin, xmax, kx, alpha, ebcs, nbcs, src, ana = \
        problem_samples.d1_problem_02()
    grid = Grid1d.new_uniform(xmin, xmax, 201)
    fdm = Fdm1d(grid, ebcs, nbcs, kx)
    a = fdm.solve_sps(alpha, src)
    assert _max_err_1d(fdm, a, ana) < 0.3  # temps up to 320
    assert abs(a[0] - 320.0) < 1e-12


def test_spc_1d_problem_01():
    xmin, xmax, kx, ebcs, nbcs, src, ana, flow = \
        problem_samples.d1_problem_01()
    spc = Spc1d(xmin, xmax, 8, ebcs, nbcs, kx)
    a = spc.solve_sps(0.0, src)
    assert _max_err_1d(spc, a, ana) < 1e-12  # cubic: spectral is exact
    q = spc.calculate_flow_vectors(a)
    err = 0.0
    for m in range(spc.grid.size()):
        x = spc.map_coord(spc.grid.coord(m))
        err = max(err, abs(q[m] - flow(x)))
    assert err < 1e-11
    a2 = spc.solve_lmm(0.0, src)
    np.testing.assert_allclose(a2, a, atol=1e-10)


def test_fdm_2d_problem_01():
    (xmin, xmax, ymin, ymax, kx, ky, ebcs, nbcs, src, ana, flow) = \
        problem_samples.d2_problem_01(True)
    grid = Grid2d.new_uniform(xmin, xmax, ymin, ymax, 41, 41)
    fdm = Fdm2d(grid, ebcs, nbcs, kx, ky)
    a = fdm.solve_sps(0.0, src)
    assert _max_err_2d(fdm, a, ana) < 5e-5


def test_fdm_2d_sps_equals_lmm():
    (xmin, xmax, ymin, ymax, kx, ky, ebcs, nbcs, src, ana) = \
        problem_samples.d2_problem_02()
    grid = Grid2d.new_uniform(xmin, xmax, ymin, ymax, 21, 21)
    fdm = Fdm2d(grid, ebcs, nbcs, kx, ky)
    a_sps = fdm.solve_sps(0.0, src)
    a_lmm = fdm.solve_lmm(0.0, src)
    np.testing.assert_allclose(a_lmm, a_sps, atol=1e-9)
    assert _max_err_2d(fdm, a_sps, ana) < 1e-2


def test_fdm_2d_neumann():
    # case B: Neumann on Xmin/Ymin
    (xmin, xmax, ymin, ymax, kx, ky, ebcs, nbcs, src, ana, flow) = \
        problem_samples.d2_problem_01(False)
    grid = Grid2d.new_uniform(xmin, xmax, ymin, ymax, 41, 41)
    fdm = Fdm2d(grid, ebcs, nbcs, kx, ky)
    a = fdm.solve_sps(0.0, src)
    assert _max_err_2d(fdm, a, ana) < 5e-4


def test_spc_2d_problem_01():
    (xmin, xmax, ymin, ymax, kx, ky, ebcs, nbcs, src, ana, flow) = \
        problem_samples.d2_problem_01(True)
    spc = Spc2d(xmin, xmax, ymin, ymax, 12, 12, ebcs, nbcs, kx, ky)
    a = spc.solve_sps(0.0, src)
    assert _max_err_2d(spc, a, ana) < 1e-10  # spectral accuracy
    qx, qy = spc.calculate_flow_vectors(a)
    errq = 0.0

    def cb(m, x, y):
        nonlocal errq
        fx, fy = flow(x, y)
        errq = max(errq, abs(qx[m] - fx), abs(qy[m] - fy))

    spc.for_each_coord(cb)
    assert errq < 1e-8


def test_spc_2d_neumann_combos():
    for combo in ("DDDD", "NNDD", "DDNN"):
        (xmin, xmax, ymin, ymax, kx, ky, ebcs, nbcs, src, ana) = \
            problem_samples.d2_problem_03(1.0, 0.5, combo)
        spc = Spc2d(xmin, xmax, ymin, ymax, 20, 20, ebcs, nbcs, kx, ky)
        a = spc.solve_sps(0.5, src)
        assert _max_err_2d(spc, a, ana) < 1e-6, combo


def test_spc_2d_lmm():
    (xmin, xmax, ymin, ymax, kx, ky, ebcs, nbcs, src, ana) = \
        problem_samples.d2_problem_02()
    spc = Spc2d(xmin, xmax, ymin, ymax, 10, 10, ebcs, nbcs, kx, ky)
    a_sps = spc.solve_sps(0.0, src)
    a_lmm = spc.solve_lmm(0.0, src)
    np.testing.assert_allclose(a_lmm, a_sps, atol=1e-8)
    assert _max_err_2d(spc, a_sps, ana) < 1e-6


def test_fdm_vs_spc_same_problem():
    # the reference's dual-solver validation (test_2d_prob01_{fdm,spc}.rs)
    (xmin, xmax, ymin, ymax, kx, ky, ebcs, nbcs, src, ana, flow) = \
        problem_samples.d2_problem_01(True)
    grid = Grid2d.new_uniform(xmin, xmax, ymin, ymax, 31, 31)
    fdm = Fdm2d(grid, ebcs, nbcs, kx, ky)
    a_fdm = fdm.solve_sps(0.0, src)
    (xmin, xmax, ymin, ymax, kx, ky, ebcs2, nbcs2, src, ana, flow) = \
        problem_samples.d2_problem_01(True)
    spc = Spc2d(xmin, xmax, ymin, ymax, 14, 14, ebcs2, nbcs2, kx, ky)
    a_spc = spc.solve_sps(0.0, src)
    e_fdm = _max_err_2d(fdm, a_fdm, ana)
    e_spc = _max_err_2d(spc, a_spc, ana)
    assert e_fdm < 1e-4 and e_spc < 1e-10


def test_transfinite_2d_identity_square():
    # map [-1,1]^2 to itself: boundaries are straight edges
    b = [lambda s: np.array([-1.0, s]), lambda s: np.array([1.0, s]),
         lambda r: np.array([r, -1.0]), lambda r: np.array([r, 1.0])]
    db = [lambda s: np.array([0.0, 1.0]), lambda s: np.array([0.0, 1.0]),
          lambda r: np.array([1.0, 0.0]), lambda r: np.array([1.0, 0.0])]
    ddb = [lambda v: np.array([0.0, 0.0])] * 4
    tr = Transfinite2d(b, db, ddb)
    for r, s in [(-1, -1), (0, 0), (0.3, -0.7), (1, 1)]:
        np.testing.assert_allclose(tr.point(r, s), [r, s], atol=1e-14)
    x, dxr, dxs = tr.point_and_derivs(0.2, 0.5)
    np.testing.assert_allclose(dxr, [1.0, 0.0], atol=1e-14)
    np.testing.assert_allclose(dxs, [0.0, 1.0], atol=1e-14)


def _quarter_ring_map():
    """Quarter annulus r in [1, 2], theta in [0, pi/2]."""
    a, b_ = 1.0, 2.0

    def th(s):
        return (s + 1.0) * math.pi / 4.0

    B = [lambda s: np.array([a * math.cos(th(s)), a * math.sin(th(s))]),
         lambda s: np.array([b_ * math.cos(th(s)), b_ * math.sin(th(s))]),
         lambda r: np.array([(a + b_) / 2 + (b_ - a) / 2 * r, 0.0]),
         lambda r: np.array([0.0, (a + b_) / 2 + (b_ - a) / 2 * r])]
    dB = [lambda s: np.array([-a * math.sin(th(s)) * math.pi / 4,
                              a * math.cos(th(s)) * math.pi / 4]),
          lambda s: np.array([-b_ * math.sin(th(s)) * math.pi / 4,
                              b_ * math.cos(th(s)) * math.pi / 4]),
          lambda r: np.array([(b_ - a) / 2, 0.0]),
          lambda r: np.array([0.0, (b_ - a) / 2])]
    ddB = [lambda s: np.array([-a * math.cos(th(s)) * (math.pi / 4) ** 2,
                               -a * math.sin(th(s)) * (math.pi / 4) ** 2]),
           lambda s: np.array([-b_ * math.cos(th(s)) * (math.pi / 4) ** 2,
                               -b_ * math.sin(th(s)) * (math.pi / 4) ** 2]),
           lambda r: np.array([0.0, 0.0]),
           lambda r: np.array([0.0, 0.0])]
    return Transfinite2d(B, dB, ddB)


def test_metrics_rectangle():
    m = Metrics(2, homogeneous=True)
    g = m.calculate_2d(np.array([2.0, 0.0]), np.array([0.0, 3.0]))
    assert g == pytest.approx(36.0)
    np.testing.assert_allclose(m.gg_mat, [[0.25, 0.0], [0.0, 1.0 / 9.0]])


def test_spc_map_2d_laplace_on_ring():
    # solve lap(phi) = 0 on the quarter ring with phi = ln(r)/ln(2) exact
    tr = _quarter_ring_map()
    ebcs = EssentialBcs2d()
    # phi = ln(sqrt(x^2+y^2)) / ln(2): 0 on inner, 1 on outer radius
    ana = lambda x, y: math.log(math.hypot(x, y)) / math.log(2.0)
    ebcs.set(Side.XMIN, lambda x, y: 0.0)
    ebcs.set(Side.XMAX, lambda x, y: 1.0)
    ebcs.set(Side.YMIN, ana)
    ebcs.set(Side.YMAX, ana)
    nbcs = NaturalBcs2d()
    spc = SpcMap2d(15, 15, tr, ebcs, nbcs, k=1.0)
    a = spc.solve_sps(0.0, lambda x, y: 0.0)
    err = 0.0

    def cb(m, x, y):
        nonlocal err
        err = max(err, abs(a[m] - ana(x, y)))

    spc.for_each_coord(cb)
    assert err < 1e-9


def test_fdm_1d_problem_03_neumann_alpha():
    # -phi'' + phi = x^2 with a Neumann end (test_1d_prob03_fdm.rs)
    xmin, xmax, kx, alpha, ebcs, nbcs, src, ana = \
        problem_samples.d1_problem_03()
    grid = Grid1d.new_uniform(xmin, xmax, 101)
    fdm = Fdm1d(grid, ebcs, nbcs, kx)
    a = fdm.solve_sps(alpha, src)
    assert _max_err_1d(fdm, a, ana) < 5e-4


def test_spc_1d_problem_03_neumann_alpha():
    xmin, xmax, kx, alpha, ebcs, nbcs, src, ana = \
        problem_samples.d1_problem_03()
    spc = Spc1d(xmin, xmax, 12, ebcs, nbcs, kx)
    a = spc.solve_sps(alpha, src)
    assert _max_err_1d(spc, a, ana) < 1e-10  # spectral


def test_fdm_2d_problem_04_fourier_series():
    # -lap(phi) = 1, homogeneous Dirichlet; Fourier-series analytic
    # (test_2d_prob04_fdm.rs)
    (xmin, xmax, ymin, ymax, kx, ky, ebcs, nbcs, src, ana) = \
        problem_samples.d2_problem_04(201)
    grid = Grid2d.new_uniform(xmin, xmax, ymin, ymax, 33, 33)
    fdm = Fdm2d(grid, ebcs, nbcs, kx, ky)
    a = fdm.solve_sps(0.0, src)
    assert _max_err_2d(fdm, a, ana) < 5e-4


def test_fdm_2d_problem_05_cubic_neumann():
    # phi = 1 + x^3 with zero-flux y-sides: FDM is near-exact up to h^2
    # truncation of x^3 (test_2d_prob05_fdm.rs)
    (xmin, xmax, ymin, ymax, kx, ky, ebcs, nbcs, src, ana) = \
        problem_samples.d2_problem_05()
    grid = Grid2d.new_uniform(xmin, xmax, ymin, ymax, 41, 41)
    fdm = Fdm2d(grid, ebcs, nbcs, kx, ky)
    a = fdm.solve_sps(0.0, src)
    assert _max_err_2d(fdm, a, ana) < 2e-3


def test_fdm_and_spc_2d_problem_06_tanh_mixed():
    # phi = tanh(1 - x + y), Dirichlet on 3 sides + flux on Xmax
    # (test_2d_prob06_{fdm,spc}.rs)
    (xmin, xmax, ymin, ymax, kx, ky, ebcs, nbcs, src, ana) = \
        problem_samples.d2_problem_06()
    grid = Grid2d.new_uniform(xmin, xmax, ymin, ymax, 41, 41)
    fdm = Fdm2d(grid, ebcs, nbcs, kx, ky)
    a = fdm.solve_sps(0.0, src)
    assert _max_err_2d(fdm, a, ana) < 2e-3

    spc = Spc2d(xmin, xmax, ymin, ymax, 16, 16, ebcs, nbcs, kx, ky)
    a_s = spc.solve_sps(0.0, src)
    assert _max_err_2d(spc, a_s, ana) < 1e-7  # spectral


def test_spc_2d_problem_07_kopriva():
    # Kopriva benchmark 5.2.1.7: phi = cos(2 pi x) sin(2 pi y)
    # (test_2d_prob07_spc.rs)
    (xmin, xmax, ymin, ymax, kx, ky, ebcs, nbcs, src, ana) = \
        problem_samples.d2_problem_07()
    spc = Spc2d(xmin, xmax, ymin, ymax, 24, 24, ebcs, nbcs, kx, ky)
    a = spc.solve_sps(0.0, src)
    assert _max_err_2d(spc, a, ana) < 1e-9


def test_spc_1d_problem_04ab_trefethen():
    # Trefethen Program 13 (test_1d_prob04_{fdm,spc}.rs)
    for prob in (problem_samples.d1_problem_04a,
                 problem_samples.d1_problem_04b):
        xmin, xmax, kx, ebcs, nbcs, src, ana = prob()
        spc = Spc1d(xmin, xmax, 24, ebcs, nbcs, kx)
        a = spc.solve_sps(0.0, src)
        assert _max_err_1d(spc, a, ana) < 1e-9, prob
        grid = Grid1d.new_uniform(xmin, xmax, 201)
        fdm = Fdm1d(grid, ebcs, nbcs, kx)
        af = fdm.solve_sps(0.0, src)
        assert _max_err_1d(fdm, af, ana) < 5e-4, prob


def test_fdm_spc_1d_problem_05_helmholtz_flux():
    # phi'' + beta^2 phi = 0, flux-driven left end
    # (test_1d_prob05_{fdm,spc}.rs)
    beta, ll, g0, phi_ll = 1.25, 1.0, 0.5, 2.0
    xmin, xmax, kx, ebcs, nbcs, src, ana, flow = \
        problem_samples.d1_problem_05(beta, ll, g0, phi_ll)
    spc = Spc1d(xmin, xmax, 16, ebcs, nbcs, kx)
    a = spc.solve_sps(beta * beta, src)
    assert _max_err_1d(spc, a, ana) < 1e-10
    q = spc.calculate_flow_vectors(a)
    err = 0.0
    for m in range(spc.grid.size()):
        x = spc.map_coord(spc.grid.coord(m))
        err = max(err, abs(q[m] - flow(x)))
    assert err < 1e-8
    grid = Grid1d.new_uniform(xmin, xmax, 201)
    fdm = Fdm1d(grid, ebcs, nbcs, kx)
    af = fdm.solve_sps(beta * beta, src)
    assert _max_err_1d(fdm, af, ana) < 1e-4


def _half_ring_map(a, b_):
    """Half annulus r in [a, b], theta in [0, pi] (half_ring_2d of
    transfinite_samples.rs:257)."""
    def th(s):
        return (s + 1.0) * math.pi / 2.0

    h = math.pi / 2.0
    B = [lambda s: np.array([a * math.cos(th(s)), a * math.sin(th(s))]),
         lambda s: np.array([b_ * math.cos(th(s)), b_ * math.sin(th(s))]),
         lambda r: np.array([a + (b_ - a) * (r + 1.0) / 2.0, 0.0]),
         lambda r: np.array([-a - (b_ - a) * (r + 1.0) / 2.0, 0.0])]
    dB = [lambda s: np.array([-a * math.sin(th(s)) * h,
                              a * math.cos(th(s)) * h]),
          lambda s: np.array([-b_ * math.sin(th(s)) * h,
                              b_ * math.cos(th(s)) * h]),
          lambda r: np.array([(b_ - a) / 2.0, 0.0]),
          lambda r: np.array([-(b_ - a) / 2.0, 0.0])]
    ddB = [lambda s: np.array([-a * math.cos(th(s)) * h * h,
                               -a * math.sin(th(s)) * h * h]),
           lambda s: np.array([-b_ * math.cos(th(s)) * h * h,
                               -b_ * math.sin(th(s)) * h * h]),
           lambda r: np.array([0.0, 0.0]),
           lambda r: np.array([0.0, 0.0])]
    return Transfinite2d(B, dB, ddB)


def test_spc_map_2d_flow_past_cylinder():
    # d2_problem_09 (test_2d_prob09_spc.rs): potential flow past a
    # cylinder on the half ring, phi = (r + ra^2/r) v_inf cos(theta);
    # Dirichlet at the far field, zero flux on the cylinder and walls
    ra, rb, v_inf = 0.5, 10.0, 0.5
    tr = _half_ring_map(ra, rb)

    def ana(x, y):
        r = math.hypot(x, y)
        return (r + ra * ra / r) * v_inf * math.cos(math.atan2(y, x))

    ebcs = EssentialBcs2d()
    ebcs.set(Side.XMAX, ana)
    nbcs = NaturalBcs2d()
    nbcs.set(Side.XMIN, lambda x, y: 0.0)
    nbcs.set(Side.YMIN, lambda x, y: 0.0)
    nbcs.set(Side.YMAX, lambda x, y: 0.0)
    spc = SpcMap2d(11, 11, tr, ebcs, nbcs, k=-1.0)
    a = spc.solve_sps(0.0, lambda x, y: 0.0)
    err = 0.0

    def cb(m, x, y):
        nonlocal err
        err = max(err, abs(a[m] - ana(x, y)))

    spc.for_each_coord(cb)
    assert err < 2.22e-2  # the reference's nn=10 tolerance
