import numpy as np
import pytest
import jax
import jax.numpy as jnp

from russell_tpu.core import approx_eq, array_approx_eq, complex_array_approx_eq
from russell_tpu.dense import (
    vec_add, vec_inner, vec_rms_scaled, vec_max_scaled, vec_all_finite,
    complex_vec_zip, complex_vec_unzip,
    mat_vec_mul, vec_mat_mul, vec_outer, mat_sum_rows, mat_sum_cols,
    solve_lin_sys,
    mat_add, mat_mat_mul, mat_t_mat_mul, mat_cholesky, mat_eigen,
    mat_eigenvalues, mat_eigen_sym, mat_eigen_sym_jacobi, mat_gen_eigen,
    mat_svd, mat_inverse, mat_pseudo_inverse, mat_sym_rank_op,
    mat_convert_to_blas_band, mat_to_numpy, mat_to_mathematica,
)


def test_vec_ops():
    u = np.array([1.0, 2.0, 3.0])
    v = np.array([4.0, 5.0, 6.0])
    array_approx_eq(vec_add(2.0, u, -1.0, v), [-2, -1, 0], 1e-15)
    approx_eq(vec_inner(u, v), 32.0, 1e-15)
    assert bool(vec_all_finite(u))
    assert not bool(vec_all_finite([1.0, np.nan]))
    approx_eq(vec_rms_scaled(u, v, 1.0, 0.0), np.sqrt(np.mean(u ** 2)), 1e-14)
    approx_eq(vec_max_scaled(u, v), max(abs(u) / (1 + abs(v))), 1e-14)
    z = complex_vec_zip(u, v)
    r, i = complex_vec_unzip(z)
    array_approx_eq(r, u, 1e-15)
    array_approx_eq(i, v, 1e-15)


def test_matvec_ops():
    a = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    u = np.array([1.0, -1.0])
    array_approx_eq(mat_vec_mul(2.0, a, u), 2 * a @ u, 1e-14)
    array_approx_eq(vec_mat_mul(1.0, np.ones(3), a), np.ones(3) @ a, 1e-14)
    array_approx_eq(vec_outer(1.0, u, u), np.outer(u, u), 1e-15)
    array_approx_eq(mat_sum_rows(a), a.sum(axis=0), 1e-15)
    array_approx_eq(mat_sum_cols(a), a.sum(axis=1), 1e-15)


def test_solve_lin_sys():
    a = np.array([[2.0, 1.0], [1.0, 3.0]])
    b = np.array([3.0, 4.0])
    x = solve_lin_sys(a, b)
    array_approx_eq(a @ np.asarray(x), b, 1e-14)
    # complex twin
    ac = a + 1j * np.array([[0.0, 1.0], [-1.0, 0.0]])
    bc = b + 1j
    xc = solve_lin_sys(ac, bc)
    complex_array_approx_eq(ac @ np.asarray(xc), bc, 1e-13)
    with pytest.raises(ValueError):
        solve_lin_sys(np.ones((2, 3)), b)


def test_mat_basic():
    a = np.array([[1.0, 2.0], [3.0, 4.0]])
    b = np.eye(2)
    array_approx_eq(mat_add(1.0, a, 10.0, b), a + 10 * b, 1e-15)
    array_approx_eq(mat_mat_mul(1.0, a, a), a @ a, 1e-14)
    array_approx_eq(mat_t_mat_mul(1.0, a, a), a.T @ a, 1e-14)
    c = np.zeros((2, 2))
    array_approx_eq(mat_sym_rank_op(2.0, a, 0.0, c), 2 * a @ a.T, 1e-13)


def test_cholesky():
    a = np.array([[4.0, 2.0], [2.0, 3.0]])
    l = np.asarray(mat_cholesky(a))
    array_approx_eq(l @ l.T, a, 1e-13)
    u = np.asarray(mat_cholesky(a, lower=False))
    array_approx_eq(u.T @ u, a, 1e-13)


def test_eigen_general():
    a = np.array([[0.0, 1.0], [-2.0, -3.0]])  # eigenvalues -1, -2
    lr, li, vr, vi = mat_eigen(a)
    lam = np.sort(np.asarray(lr))
    array_approx_eq(lam, [-2.0, -1.0], 1e-12)
    array_approx_eq(np.asarray(li), [0.0, 0.0], 1e-12)
    w = np.asarray(mat_eigenvalues(a))
    array_approx_eq(np.sort(w.real), [-2.0, -1.0], 1e-12)
    # complex pair
    rot = np.array([[0.0, -1.0], [1.0, 0.0]])
    w2 = np.sort_complex(np.asarray(mat_eigenvalues(rot)))
    complex_array_approx_eq(w2, [-1j, 1j], 1e-12)


def test_eigen_jittable_host_callback():
    """mat_eigen is traceable (pure_callback), incl. under vmap."""
    a = np.array([[0.0, 1.0], [-2.0, -3.0]])
    lr, li, vr, vi = jax.jit(mat_eigen)(a)
    array_approx_eq(np.sort(np.asarray(lr)), [-2.0, -1.0], 1e-12)
    # residual check A v = lambda v (complex, assembled from planes)
    lam = np.asarray(lr) + 1j * np.asarray(li)
    V = np.asarray(vr) + 1j * np.asarray(vi)
    array_approx_eq(np.abs(a @ V - V * lam[None, :]), np.zeros((2, 2)), 1e-12)
    batch = np.stack([a, a.T])
    lrb, _, _, _ = jax.vmap(mat_eigen)(batch)
    array_approx_eq(np.sort(np.asarray(lrb), axis=1),
                    [[-2.0, -1.0], [-2.0, -1.0]], 1e-12)


def test_eigen_sym_and_jacobi():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((6, 6))
    a = (a + a.T) / 2
    w, v = mat_eigen_sym(a)
    w, v = np.asarray(w), np.asarray(v)
    array_approx_eq(v @ np.diag(w) @ v.T, a, 1e-12)
    wj, vj = mat_eigen_sym_jacobi(jnp.asarray(a))
    wj, vj = np.asarray(wj), np.asarray(vj)
    array_approx_eq(np.sort(wj), np.sort(w), 1e-11)
    array_approx_eq(vj @ np.diag(wj) @ vj.T, a, 1e-11)
    # equal-diagonal case exercises the 45-degree rotation branch
    b = np.array([[2.0, 1.0], [1.0, 2.0]])
    wb, _ = mat_eigen_sym_jacobi(jnp.asarray(b))
    array_approx_eq(np.sort(np.asarray(wb)), [1.0, 3.0], 1e-13)


def test_gen_eigen():
    a = np.array([[2.0, 0.0], [0.0, 3.0]])
    b = np.array([[1.0, 0.0], [0.0, 2.0]])
    lr, li, _, _ = mat_gen_eigen(a, b)
    array_approx_eq(np.sort(np.asarray(lr)), [1.5, 2.0], 1e-12)


def test_svd_inverse_pinv():
    a = np.array([[3.0, 1.0], [1.0, 3.0], [0.0, 2.0]])
    s, u, vt = mat_svd(a)
    s, u, vt = np.asarray(s), np.asarray(u), np.asarray(vt)
    array_approx_eq(u[:, :2] @ np.diag(s) @ vt, a, 1e-12)
    for n in (1, 2, 3, 5):
        rng = np.random.default_rng(n)
        m = rng.standard_normal((n, n)) + 3 * np.eye(n)
        inv, det = mat_inverse(m)
        array_approx_eq(np.asarray(inv) @ m, np.eye(n), 1e-10)
        approx_eq(det, np.linalg.det(m), abs(np.linalg.det(m)) * 1e-10)
    p = np.asarray(mat_pseudo_inverse(a))
    array_approx_eq(a @ p @ a, a, 1e-11)


def test_band_and_exporters():
    a = np.array([
        [1.0, 2.0, 0.0, 0.0],
        [5.0, 1.0, 2.0, 0.0],
        [0.0, 5.0, 1.0, 2.0],
        [0.0, 0.0, 5.0, 1.0],
    ])
    band = np.asarray(mat_convert_to_blas_band(a, 1, 1))
    assert band.shape == (3, 4)
    array_approx_eq(band[1], [1, 1, 1, 1], 1e-15)
    array_approx_eq(band[0][1:], [2, 2, 2], 1e-15)
    array_approx_eq(band[2][:-1], [5, 5, 5], 1e-15)
    txt = mat_to_numpy(a[:2, :2])
    assert "np.array" in txt and "1.0" in txt
    mtxt = mat_to_mathematica(a[:2, :2])
    assert mtxt.startswith("{{") and mtxt.endswith("}}")
