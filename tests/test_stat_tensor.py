"""stat + tensor crate tests."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats as ss

from russell_tpu.stat import (DistributionFrechet, DistributionGumbel,
                              DistributionLognormal, DistributionNormal,
                              DistributionUniform, Histogram, Statistics,
                              inter_quartile_range, outliers, quantile,
                              quartiles)
from russell_tpu.tensor import (LinElasticity, Mandel, Spectral2, Tensor2,
                                Tensor4, deriv1_invariant_jj2,
                                deriv1_invariant_jj3, deriv_inverse_tensor,
                                deriv_squared_tensor, t2_ddot_t2,
                                t2_dyad_t2, t4_ddot_t2, t4_ddot_t4,
                                vec_dyad_vec)


# ---------------------------- stat ------------------------------------------


def test_normal_distribution():
    d = DistributionNormal(2.0, 3.0)
    xs = np.linspace(-5, 9, 20)
    np.testing.assert_allclose(np.asarray(d.pdf(xs)),
                               ss.norm.pdf(xs, 2.0, 3.0), atol=1e-14)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)),
                               ss.norm.cdf(xs, 2.0, 3.0), atol=1e-14)
    assert d.mean() == 2.0 and d.variance() == 9.0
    s = d.sample(jax.random.PRNGKey(0), (20000,))
    assert abs(float(jnp.mean(s)) - 2.0) < 0.1


def test_lognormal_distribution():
    d = DistributionLognormal(0.5, 0.25)
    xs = np.linspace(0.1, 6, 20)
    np.testing.assert_allclose(np.asarray(d.pdf(xs)),
                               ss.lognorm.pdf(xs, 0.25,
                                              scale=math.exp(0.5)),
                               atol=1e-12)
    d2 = DistributionLognormal.new_from_mu_sig(2.0, 0.5)
    assert d2.mean() == pytest.approx(2.0, rel=1e-12)
    assert math.sqrt(d2.variance()) == pytest.approx(0.5, rel=1e-12)


def test_gumbel_distribution():
    d = DistributionGumbel(1.0, 2.0)
    xs = np.linspace(-4, 10, 20)
    np.testing.assert_allclose(np.asarray(d.pdf(xs)),
                               ss.gumbel_r.pdf(xs, 1.0, 2.0), atol=1e-14)
    d2 = DistributionGumbel.new_from_mu_sig(5.0, 2.0)
    assert d2.mean() == pytest.approx(5.0, rel=1e-12)
    assert d2.variance() == pytest.approx(4.0, rel=1e-12)


def test_frechet_distribution():
    # mean/variance oracle from the reference test
    # (distribution_frechet.rs:327)
    d = DistributionFrechet(8.782275, 1.0, 4.095645)
    assert d.mean() == pytest.approx(10.0, abs=1e-6)
    assert d.variance() == pytest.approx(0.25, abs=1e-6)
    d2 = DistributionFrechet(8.782275, 1.0, 1.0)
    assert d2.mean() == math.inf and d2.variance() == math.inf
    assert float(d.pdf(8.0)) == 0.0 and float(d.cdf(8.0)) == 0.0
    xs = np.linspace(9.0, 12.0, 8)
    np.testing.assert_allclose(
        np.asarray(d.cdf(xs)),
        ss.invweibull.cdf(xs, 4.095645, loc=8.782275, scale=1.0), atol=1e-12)


def test_uniform_distribution():
    d = DistributionUniform(1.0, 3.0)
    assert float(d.pdf(2.0)) == 0.5 and float(d.pdf(0.0)) == 0.0
    assert float(d.cdf(2.0)) == 0.5
    assert d.mean() == 2.0 and d.variance() == pytest.approx(1.0 / 3.0)


def test_statistics_and_quantiles():
    data = [1.0, 2.0, 3.0, 4.0, 5.0, 100.0]
    st = Statistics(data)
    assert st.min == 1.0 and st.max == 100.0
    assert st.mean == pytest.approx(np.mean(data))
    assert st.std_dev == pytest.approx(np.std(data, ddof=1))
    sorted_d = sorted(data)
    assert quantile(sorted_d, 0.5) == pytest.approx(np.quantile(data, 0.5))
    q1, q2, q3 = quartiles(data)
    assert q2 == pytest.approx(np.median(data))
    assert inter_quartile_range(data) == pytest.approx(q3 - q1)
    out = outliers(data)
    assert out == [(5, 100.0)]
    with pytest.raises(ValueError):
        quantile([], 0.5)
    with pytest.raises(ValueError):
        quantile([1.0], 1.5)


def test_histogram():
    h = Histogram([0.0, 1.0, 2.0, 3.0])
    h.count([0.5, 0.6, 1.5, 2.5, 2.6, 2.7, 5.0, -1.0])
    np.testing.assert_array_equal(h.get_counts(), [2, 1, 3])
    text = str(h)
    assert "|" in text and "#" in text
    h.reset()
    np.testing.assert_array_equal(h.get_counts(), [0, 0, 0])


# ---------------------------- tensor ----------------------------------------


def _sample_sym():
    m = np.array([[2.0, 1.0, 0.5], [1.0, 3.0, -0.2], [0.5, -0.2, 1.5]])
    return Tensor2.from_matrix(m, Mandel.SYMMETRIC), m


def test_tensor2_roundtrip():
    t, m = _sample_sym()
    np.testing.assert_allclose(np.asarray(t.as_matrix()), m, atol=1e-14)
    # general (non-symmetric) roundtrip
    g = np.array([[1.0, 2.0, 0.0], [3.0, 4.0, 0.5], [0.1, 0.2, 5.0]])
    tg = Tensor2.from_matrix(g, Mandel.GENERAL)
    np.testing.assert_allclose(np.asarray(tg.as_matrix()), g, atol=1e-14)
    # transpose
    np.testing.assert_allclose(np.asarray(tg.transpose().as_matrix()), g.T,
                               atol=1e-14)
    # symmetric rejection
    with pytest.raises(ValueError):
        Tensor2.from_matrix(g, Mandel.SYMMETRIC)


def test_tensor2_invariants():
    t, m = _sample_sym()
    assert float(t.invariant_ii1()) == pytest.approx(np.trace(m))
    assert float(t.invariant_ii3()) == pytest.approx(np.linalg.det(m))
    i2 = 0.5 * (np.trace(m) ** 2 - np.trace(m @ m))
    assert float(t.invariant_ii2()) == pytest.approx(i2)
    s = m - np.trace(m) / 3.0 * np.eye(3)
    jj2 = 0.5 * np.sum(s * s)
    assert float(t.invariant_jj2()) == pytest.approx(jj2)
    assert float(t.invariant_jj3()) == pytest.approx(np.linalg.det(s))
    assert float(t.invariant_sigma_d()) == pytest.approx(
        math.sqrt(3.0 * jj2))
    lode = float(t.invariant_lode())
    assert -1.0 <= lode <= 1.0
    # norm == frobenius
    assert t.norm() == pytest.approx(np.linalg.norm(m))


def test_tensor2_inverse_squared_deviator():
    t, m = _sample_sym()
    np.testing.assert_allclose(np.asarray(t.inverse().as_matrix()),
                               np.linalg.inv(m), atol=1e-12)
    np.testing.assert_allclose(np.asarray(t.squared().as_matrix()), m @ m,
                               atol=1e-12)
    dev = np.asarray(t.deviator().as_matrix())
    assert np.trace(dev) == pytest.approx(0.0, abs=1e-14)


def test_mandel_contraction_is_dot_product():
    a, ma = _sample_sym()
    b = Tensor2.from_matrix(np.array([[1.0, 0.3, 0.0], [0.3, 2.0, 0.1],
                                      [0.0, 0.1, -1.0]]), Mandel.SYMMETRIC)
    mb = np.asarray(b.as_matrix())
    assert float(t2_ddot_t2(a, b)) == pytest.approx(np.sum(ma * mb))


def test_tensor4_projectors():
    a, ma = _sample_sym()
    pdev = Tensor4.p_dev(Mandel.SYMMETRIC)
    d = t4_ddot_t2(1.0, pdev, a)
    np.testing.assert_allclose(np.asarray(d.as_matrix()),
                               np.asarray(a.deviator().as_matrix()),
                               atol=1e-13)
    # Psym acts as identity on symmetric tensors
    psym = Tensor4.p_sym(Mandel.SYMMETRIC)
    np.testing.assert_allclose(
        np.asarray(t4_ddot_t2(1.0, psym, a).as_matrix()), ma, atol=1e-13)
    # dyad: (I dyad I) : a = tr(a) I
    ii = Tensor2.identity(Mandel.SYMMETRIC)
    dy = t2_dyad_t2(1.0, ii, ii)
    np.testing.assert_allclose(
        np.asarray(t4_ddot_t2(1.0, dy, a).as_matrix()),
        np.trace(ma) * np.eye(3), atol=1e-13)
    # t4:t4 = matmul
    e = t4_ddot_t4(1.0, pdev, psym)
    np.testing.assert_allclose(np.asarray(e.mat), np.asarray(pdev.mat),
                               atol=1e-13)


def test_derivatives_vs_autodiff():
    t, m = _sample_sym()

    def jj2_of_vec(v):
        return Tensor2(Mandel.SYMMETRIC, v).invariant_jj2()

    g = jax.grad(jj2_of_vec)(t.vec)
    np.testing.assert_allclose(np.asarray(deriv1_invariant_jj2(t).vec),
                               np.asarray(g), atol=1e-12)

    def jj3_of_vec(v):
        return Tensor2(Mandel.SYMMETRIC, v).invariant_jj3()

    g3 = jax.grad(jj3_of_vec)(t.vec)
    np.testing.assert_allclose(np.asarray(deriv1_invariant_jj3(t).vec),
                               np.asarray(g3), atol=1e-12)


def test_deriv_inverse_and_squared_fd():
    t, m = _sample_sym()
    dinv = deriv_inverse_tensor(t)
    dsq = deriv_squared_tensor(t)
    # finite differences in Mandel space
    h = 1e-7
    for k in range(6):
        vp = t.vec.at[k].add(h)
        vm = t.vec.at[k].add(-h)
        fd_inv = (Tensor2(Mandel.SYMMETRIC, vp).inverse().vec
                  - Tensor2(Mandel.SYMMETRIC, vm).inverse().vec) / (2 * h)
        np.testing.assert_allclose(np.asarray(dinv.mat[:, k]),
                                   np.asarray(fd_inv), atol=1e-6)
        fd_sq = (Tensor2(Mandel.SYMMETRIC, vp).squared().vec
                 - Tensor2(Mandel.SYMMETRIC, vm).squared().vec) / (2 * h)
        np.testing.assert_allclose(np.asarray(dsq.mat[:, k]),
                                   np.asarray(fd_sq), atol=1e-6)


def test_lin_elasticity():
    # 3D: uniaxial strain
    le = LinElasticity(young=210e3, poisson=0.3)
    eps = Tensor2(Mandel.SYMMETRIC, np.array([1e-3, 0, 0, 0, 0, 0]))
    sig = le.calc_stress(eps)
    E, nu = 210e3, 0.3
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    G = E / (2 * (1 + nu))
    assert float(sig.vec[0]) == pytest.approx(lam * 1e-3 + 2 * G * 1e-3)
    assert float(sig.vec[1]) == pytest.approx(lam * 1e-3)
    # compliance inverts the stiffness
    C = le.calc_compliance()
    np.testing.assert_allclose(np.asarray(C.mat @ le.dd.mat), np.eye(6),
                               atol=1e-10)
    # plane stress: sigma_zz decoupled
    ps = LinElasticity(young=3000.0, poisson=0.2, plane_stress=True)
    eps2 = Tensor2(Mandel.SYMMETRIC_2D, np.array([1e-3, -2e-4, 0.0, 1e-4]))
    sig2 = ps.calc_stress(eps2)
    c = 3000.0 / (1 - 0.04)
    assert float(sig2.vec[0]) == pytest.approx(c * (1e-3 + 0.2 * -2e-4))
    assert ps.out_of_plane_strain(sig2) != 0.0


def test_spectral2():
    t, m = _sample_sym()
    sp = Spectral2()
    sp.decompose(t)
    w = np.linalg.eigvalsh(m)
    np.testing.assert_allclose(np.sort(np.asarray(sp.lambdas)), np.sort(w),
                               atol=1e-12)
    # compose with original eigenvalues recovers the tensor
    back = sp.compose(sp.lambdas)
    np.testing.assert_allclose(np.asarray(back.as_matrix()), m, atol=1e-12)
    # compose with modified eigenvalues: exp of tensor
    expd = sp.compose(jnp.exp(sp.lambdas))
    from scipy.linalg import expm
    np.testing.assert_allclose(np.asarray(expd.as_matrix()), expm(m),
                               atol=1e-10)


def test_vec_dyad_vec():
    u = np.array([1.0, 2.0, 3.0])
    v = np.array([0.5, -1.0, 2.0])
    t = vec_dyad_vec(2.0, u, v)
    expect = 2.0 * 0.5 * (np.outer(u, v) + np.outer(v, u))
    np.testing.assert_allclose(np.asarray(t.as_matrix()), expect,
                               atol=1e-13)


def test_octahedral_roundtrip():
    t = Tensor2.from_octahedral(2.0, 1.5, 0.3)
    assert float(t.octahedral_distance()) == pytest.approx(2.0, abs=1e-12)
    assert float(t.octahedral_radius()) == pytest.approx(1.5, abs=1e-12)
    assert float(t.invariant_lode()) == pytest.approx(0.3, abs=1e-10)
