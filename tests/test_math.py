"""Special-function tests against scipy/mpmath-grade oracles.

Mirrors the reference's accuracy sweeps
(russell_lab/tests/more_tests_bessel_functions.rs: |err| <= 1e-15 vs
A&S tables; more_tests_elliptic_functions.rs).
"""

import math

import numpy as np
import pytest
from scipy import special as sp

from russell_tpu import math as rm


XS = np.concatenate([np.linspace(1e-6, 8, 120), np.linspace(8, 30, 120),
                     np.linspace(30, 200, 60),
                     [0.5, 7.9, 8.0, 8.1, 16.9, 17.1, 25.9, 26.1]])


def test_bessel_j0_j1():
    assert np.max(np.abs(np.asarray(rm.bessel_j0(XS)) - sp.j0(XS))) < 2e-15
    assert np.max(np.abs(np.asarray(rm.bessel_j1(XS)) - sp.j1(XS))) < 2e-15
    # parity
    assert abs(float(rm.bessel_j0(-3.0)) - sp.j0(3.0)) < 1e-15
    assert abs(float(rm.bessel_j1(-3.0)) + sp.j1(3.0)) < 1e-15
    assert float(rm.bessel_j0(0.0)) == pytest.approx(1.0, abs=1e-15)


def test_bessel_y0_y1():
    assert np.max(np.abs(np.asarray(rm.bessel_y0(XS)) - sp.y0(XS))) < 2e-14
    assert np.max(np.abs(np.asarray(rm.bessel_y1(XS)) - sp.y1(XS))) < 2e-14
    assert float(rm.bessel_y0(0.0)) == -math.inf
    assert float(rm.bessel_y1(0.0)) == -math.inf
    assert math.isnan(float(rm.bessel_y0(-1.0)))


def test_bessel_jn_yn():
    for n in (2, 3, 5, 10, 20):
        w = sp.jn(n, XS)
        err = np.max(np.abs(np.asarray(rm.bessel_jn(n, XS)) - w)
                     / np.maximum(np.abs(w), 1.0))
        assert err < 1e-14, n
        wy = sp.yn(n, XS)
        erry = np.max(np.abs(np.asarray(rm.bessel_yn(n, XS)) - wy)
                      / np.maximum(np.abs(wy), 1.0))
        assert erry < 1e-13, n
    # negative order: J_{-n} = (-1)^n J_n
    assert float(rm.bessel_jn(-3, 2.5)) == pytest.approx(-sp.jn(3, 2.5),
                                                         abs=1e-15)


def test_bessel_modified():
    xs = np.linspace(0.0, 30, 100)
    assert np.max(np.abs(np.asarray(rm.bessel_i0(xs)) - sp.i0(xs))
                  / np.maximum(sp.i0(xs), 1.0)) < 1e-13
    assert np.max(np.abs(np.asarray(rm.bessel_i1(xs)) - sp.i1(xs))
                  / np.maximum(sp.i1(xs), 1.0)) < 1e-13
    for n in (2, 5):
        w = sp.iv(n, xs[1:])
        err = np.max(np.abs(np.asarray(rm.bessel_in(n, xs[1:])) - w) / w)
        assert err < 1e-13, n
    xk = np.concatenate([np.linspace(1e-5, 2, 80), np.linspace(2, 60, 120)])
    assert np.max(np.abs(np.asarray(rm.bessel_k0(xk)) - sp.k0(xk))
                  / sp.k0(xk)) < 1e-13
    assert np.max(np.abs(np.asarray(rm.bessel_k1(xk)) - sp.k1(xk))
                  / sp.k1(xk)) < 1e-13
    for n in (2, 5, 10):
        assert np.max(np.abs(np.asarray(rm.bessel_kn(n, xk)) - sp.kn(n, xk))
                      / sp.kn(n, xk)) < 1e-13
    assert float(rm.bessel_k0(0.0)) == math.inf


def test_gamma_family():
    xs = np.array([0.5, 1.0, 1.5, 3.7, 10.0, 20.5])
    np.testing.assert_allclose(np.asarray(rm.gamma(xs)), sp.gamma(xs),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(rm.ln_gamma(xs)), sp.gammaln(xs),
                               rtol=1e-13)
    assert math.isnan(float(rm.gamma(-2.0)))
    assert float(rm.beta(2.0, 3.0)) == pytest.approx(1.0 / 12.0, rel=1e-13)
    assert rm.factorial_lookup_22(5) == 120.0
    with pytest.raises(ValueError):
        rm.factorial_lookup_22(23)


def test_erf_family():
    xs = np.linspace(-3, 3, 50)
    np.testing.assert_allclose(np.asarray(rm.erf(xs)), sp.erf(xs), atol=1e-14)
    np.testing.assert_allclose(np.asarray(rm.erfc(xs)), sp.erfc(xs),
                               atol=1e-14)
    ys = np.linspace(-0.99, 0.99, 41)
    np.testing.assert_allclose(np.asarray(rm.erf_inv(ys)), sp.erfinv(ys),
                               rtol=1e-9)
    assert float(rm.erf_inv(1.0)) == math.inf
    assert math.isnan(float(rm.erf_inv(1.5)))
    assert float(rm.erfc_inv(0.3)) == pytest.approx(sp.erfcinv(0.3),
                                                    rel=1e-9)


def test_elliptic():
    # oracle values via scipy (Carlson forms)
    for phi in (0.1, 0.7, 1.2, np.pi / 2):
        for m in (0.0, 0.5, 0.9):
            assert float(rm.elliptic_f(phi, m)) == pytest.approx(
                sp.ellipkinc(phi, m), rel=1e-13)
            assert float(rm.elliptic_e(phi, m)) == pytest.approx(
                sp.ellipeinc(phi, m), rel=1e-13)
    # complete integrals
    assert float(rm.elliptic_f(np.pi / 2, 0.5)) == pytest.approx(
        sp.ellipk(0.5), rel=1e-13)
    # out-of-domain -> nan
    assert math.isnan(float(rm.elliptic_f(-0.1, 0.5)))


def test_chebyshev():
    xs = np.linspace(-1, 1, 21)
    for n in (0, 1, 2, 5, 10):
        np.testing.assert_allclose(np.asarray(rm.chebyshev_tn(n, xs)),
                                   np.cos(n * np.arccos(xs)), atol=1e-12)
    # derivative check vs numpy polynomial
    for n in (2, 5):
        c = np.zeros(n + 1)
        c[n] = 1.0
        d1 = np.polynomial.chebyshev.chebder(c)
        np.testing.assert_allclose(
            np.asarray(rm.chebyshev_tn_deriv1(n, xs)),
            np.polynomial.chebyshev.chebval(xs, d1), atol=1e-10)
        d2 = np.polynomial.chebyshev.chebder(c, 2)
        np.testing.assert_allclose(
            np.asarray(rm.chebyshev_tn_deriv2(n, xs)),
            np.polynomial.chebyshev.chebval(xs, d2), atol=1e-9)
    pts = rm.chebyshev_lobatto_points(4)
    assert pts[0] == -1.0 and pts[-1] == 1.0
    assert np.all(np.diff(pts) > 0)


def test_legendre():
    xs = np.linspace(-1, 1, 21)
    for n in (0, 1, 2, 5, 10):
        c = np.zeros(n + 1)
        c[n] = 1.0
        np.testing.assert_allclose(np.asarray(rm.legendre_pn(n, xs)),
                                   np.polynomial.legendre.legval(xs, c),
                                   atol=1e-12)
    # gauss quadrature integrates polynomials of degree 2n+1 exactly
    x = rm.legendre_gauss_points(4)
    w = rm.legendre_gauss_weights(4)
    xn, wn = np.polynomial.legendre.leggauss(5)
    np.testing.assert_allclose(x, xn, atol=1e-13)
    np.testing.assert_allclose(w, wn, atol=1e-13)
    # lobatto: integrate x^6 on [-1,1] = 2/7 with nn=4 (exact to 2*4-1=7)
    xl = rm.legendre_lobatto_points(4)
    wl = rm.legendre_lobatto_weights(4)
    assert np.sum(wl * xl ** 6) == pytest.approx(2.0 / 7.0, rel=1e-12)
    assert xl[0] == -1.0 and xl[-1] == 1.0


def test_composition_functions():
    assert float(rm.ramp(-2.0)) == 0.0 and float(rm.ramp(3.0)) == 3.0
    assert float(rm.heaviside(0.0)) == 0.5
    assert float(rm.boxcar(0.5, 0.0, 1.0)) == 1.0
    assert float(rm.logistic(0.0)) == 0.5
    assert float(rm.logistic_deriv1(0.0)) == 0.25
    assert float(rm.smooth_ramp(10.0, 2.0)) == pytest.approx(10.0, rel=1e-6)
    assert float(rm.smooth_ramp(-500.0, 2.0)) == 0.0
    assert float(rm.neg_one_pow_n(3)) == -1.0
    assert float(rm.suq_sin(np.pi / 2, 2.0)) == pytest.approx(1.0)
    assert rm.float_is_integer(4.0) and not rm.float_is_integer(4.5)
    assert rm.float_is_neg_integer(-3.0)
    i, f = rm.float_split(3.25)
    assert i == 3.0 and f == 0.25
    m, e = rm.float_decompose(8.0)
    assert rm.float_compose(m, e) == 8.0
    assert float(rm.modulo(5.5, 2.0)) == pytest.approx(1.5)
    assert float(rm.modulo(-5.5, 2.0)) == pytest.approx(-1.5)  # sign of x
    assert rm.i_pow_n(2) == -1
    assert rm.x_times_i_pow_n(3.0, 3) == -3.0j


def test_vmappable_and_jittable():
    import jax
    f = jax.jit(jax.vmap(rm.bessel_j0))
    xs = np.linspace(0, 50, 64)
    np.testing.assert_allclose(np.asarray(f(xs)), sp.j0(xs), atol=1e-14)
    g = jax.jit(lambda x: rm.elliptic_e(x, 0.5))
    assert float(g(1.0)) == pytest.approx(sp.ellipeinc(1.0, 0.5), rel=1e-12)
    # gradients flow through
    d = jax.grad(rm.bessel_j0)(1.5)
    assert float(d) == pytest.approx(-sp.j1(1.5), abs=1e-6)
