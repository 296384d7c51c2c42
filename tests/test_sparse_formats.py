import numpy as np
import pytest

import jax
import jax.numpy as jnp

from russell_tpu.core import array_approx_eq, approx_eq, complex_array_approx_eq
from russell_tpu.sparse import (
    CooMatrix, CsrMatrix, CscMatrix, Sym, MMsym,
    read_matrix_market, write_matrix_market, VerifyLinSys, samples,
)

MM_DIR = "/root/reference/russell_sparse/data/matrix_market"


def test_coo_put_and_dense():
    coo = CooMatrix(3, 3, 10)
    coo.put(0, 0, 1.0)
    coo.put(0, 0, 1.0)  # duplicate: summed
    coo.put(1, 1, 3.0)
    coo.put(2, 0, -1.0)
    a = coo.as_dense()
    array_approx_eq(a, [[2, 0, 0], [0, 3, 0], [-1, 0, 0]], 1e-15)
    assert coo.get_info() == (3, 3, 4, Sym.NO)
    with pytest.raises(ValueError):
        coo.put(3, 0, 1.0)
    coo.reset()
    assert coo.nnz == 0


def test_coo_capacity_and_sym_guards():
    coo = CooMatrix(2, 2, 1)
    coo.put(0, 0, 1.0)
    with pytest.raises(ValueError, match="max number"):
        coo.put(1, 1, 1.0)
    low = CooMatrix(2, 2, 4, Sym.YES_LOWER)
    with pytest.raises(ValueError):
        low.put(0, 1, 5.0)
    up = CooMatrix(2, 2, 4, Sym.YES_UPPER)
    with pytest.raises(ValueError):
        up.put(1, 0, 5.0)


def test_coo_symmetric_matvec():
    coo, _, _, _ = samples.lower_symmetric_5x5()
    u = np.arange(1.0, 6.0)
    full = coo.as_dense()
    array_approx_eq(coo.mat_vec_mul(u), full @ u, 1e-13)
    array_approx_eq(coo.mat_t_vec_mul(u), full.T @ u, 1e-13)


def test_coo_assign_add():
    a = CooMatrix.from_dense([[1.0, 2.0], [0.0, 3.0]])
    b = CooMatrix.from_dense([[4.0, 0.0], [1.0, 1.0]])
    c = CooMatrix(2, 2, 10)
    c.assign(2.0, a)
    array_approx_eq(c.as_dense(), [[2, 4], [0, 6]], 1e-15)
    c2 = CooMatrix(2, 2, 10)
    c2.add(2.0, a, 3.0, b)
    array_approx_eq(c2.as_dense(), [[14, 4], [3, 9]], 1e-15)


def test_complex_coo_assign_real():
    m = CooMatrix.from_dense(np.array([[1.0, 0.0], [2.0, 3.0]]))
    j = CooMatrix.from_dense(np.array([[0.5, 0.0], [1.0, 1.0]]))
    k = CooMatrix(2, 2, 10, dtype=np.complex128)
    k.assign_real(2.0, 3.0, m)
    complex_array_approx_eq(k.as_dense(), (2 + 3j) * m.as_dense(), 1e-15)
    k2 = CooMatrix(2, 2, 10, dtype=np.complex128)
    k2.add_real(2.0, 3.0, m, -1.0, j)
    complex_array_approx_eq(k2.as_dense(), (2 + 3j) * m.as_dense() - j.as_dense(), 1e-15)


def test_csr_from_coo_sums_duplicates():
    coo = CooMatrix(3, 3, 10)
    coo.put(1, 2, 1.0)
    coo.put(1, 2, 2.0)
    coo.put(0, 0, 5.0)
    csr = CsrMatrix.from_coo(coo)
    assert csr.nnz == 2
    array_approx_eq(csr.to_dense(), [[5, 0, 0], [0, 0, 3], [0, 0, 0]], 1e-15)
    csc = CscMatrix.from_coo(coo)
    array_approx_eq(csc.to_dense(), csr.to_dense(), 1e-15)


def test_csr_matvec_jit_and_values_from_coo():
    coo, csc, csr, _ = samples.umfpack_unsymmetric_5x5()
    u = np.arange(1.0, 6.0)
    dense = coo.as_dense()
    spmv = jax.jit(lambda m, v: m.mat_vec_mul(v))
    array_approx_eq(spmv(csr, jnp.asarray(u)), dense @ u, 1e-13)
    array_approx_eq(spmv(csc, jnp.asarray(u)), dense @ u, 1e-13)
    array_approx_eq(csr.mat_t_vec_mul(u), dense.T @ u, 1e-13)
    # jit-friendly value update: scale all COO values by 2
    _, _, vv = coo.triplets()
    new_vals = csr.values_from_coo(jnp.asarray(vv) * 2.0)
    csr2 = csr.with_values(new_vals)
    array_approx_eq(csr2.to_dense(), 2.0 * dense, 1e-13)


def test_csr_symmetric_matvec():
    coo, csc, csr, _ = samples.mkl_positive_definite_5x5_lower()
    u = np.arange(1.0, 6.0)
    full = coo.as_dense()
    array_approx_eq(csr.mat_vec_mul(jnp.asarray(u)), full @ u, 1e-12)
    array_approx_eq(csc.mat_vec_mul(jnp.asarray(u)), full @ u, 1e-12)


def test_verify_lin_sys():
    a = np.array([[1.0, 1.0], [0.0, 2.0]])
    x = np.array([1.0, 1.0])
    rhs = np.array([2.0, 2.0])
    v = VerifyLinSys.from_system(a, x, rhs)
    approx_eq(v.max_abs_a, 2.0, 1e-15)
    approx_eq(v.max_abs_diff, 0.0, 1e-15)
    approx_eq(v.relative_error, 0.0, 1e-15)


# -- MatrixMarket I/O --------------------------------------------------------

import os

needs_ref = pytest.mark.skipif(not os.path.isdir(MM_DIR), reason="reference data not mounted")


@needs_ref
def test_read_mm_general():
    coo, czo = read_matrix_market(f"{MM_DIR}/ok_simple_general.mtx")
    assert czo is None
    assert coo.get_info()[:3] == (3, 3, 5)
    array_approx_eq(coo.as_dense(), [[1, 2, 0], [3, 4, 0], [0, 0, 5]], 1e-15)


@needs_ref
def test_read_mm_symmetric_handlings():
    coo, _ = read_matrix_market(f"{MM_DIR}/ok_simple_symmetric.mtx", MMsym.LEAVE_AS_LOWER)
    assert coo.sym == Sym.YES_LOWER
    full = coo.as_dense()
    array_approx_eq(full, [[1, 2, 0], [2, 3, 4], [0, 4, 0]], 1e-15)
    coo_up, _ = read_matrix_market(f"{MM_DIR}/ok_simple_symmetric.mtx", MMsym.SWAP_TO_UPPER)
    assert coo_up.sym == Sym.YES_UPPER
    array_approx_eq(coo_up.as_dense(), full, 1e-15)
    coo_full, _ = read_matrix_market(f"{MM_DIR}/ok_simple_symmetric.mtx", MMsym.MAKE_IT_FULL)
    assert coo_full.sym == Sym.YES_FULL
    array_approx_eq(coo_full.as_dense(), full, 1e-15)


@needs_ref
def test_read_mm_complex():
    _, coo = read_matrix_market(f"{MM_DIR}/ok_simple_complex_general.mtx")
    assert coo is not None and coo.dtype.kind == "c"


@needs_ref
@pytest.mark.parametrize("bad", [
    "bad_empty_file.mtx", "bad_wrong_header.mtx", "bad_wrong_dims.mtx",
    "bad_missing_data.mtx", "bad_many_lines.mtx",
    "bad_symmetric_rectangular.mtx", "bad_not_complex_hermitian.mtx",
    "bad_missing_data_complex.mtx", "bad_many_lines_complex.mtx",
    "bad_wrong_dims_complex.mtx", "bad_symmetric_rectangular_complex.mtx",
])
def test_read_mm_bad_files(bad):
    with pytest.raises(ValueError):
        read_matrix_market(f"{MM_DIR}/{bad}")


def test_write_and_roundtrip(tmp_path):
    coo, _, _, _ = samples.umfpack_unsymmetric_5x5()
    p = str(tmp_path / "m.mtx")
    write_matrix_market(coo, p)
    coo2, _ = read_matrix_market(p)
    array_approx_eq(coo2.as_dense(), coo.as_dense(), 1e-12)
    ps = str(tmp_path / "m.smat")
    write_matrix_market(coo, ps)
    assert open(ps).readline().split() == ["5", "5", "12"]


def test_write_symmetric_roundtrip(tmp_path):
    coo, _, _, _ = samples.mkl_positive_definite_5x5_lower()
    p = str(tmp_path / "s.mtx")
    write_matrix_market(coo, p)
    coo2, _ = read_matrix_market(p, MMsym.LEAVE_AS_LOWER)
    array_approx_eq(coo2.as_dense(), coo.as_dense(), 1e-12)


def test_bsr_pallas_spmv_spmm():
    """Pallas BSR SpMV (interpret mode on CPU) + SpMM vs dense."""
    from russell_tpu.sparse import samples
    from russell_tpu.sparse.kernels import (bsr_from_coo, bsr_matvec,
                                            bsr_matmat)
    coo = samples.laplacian_2d(15)
    bsr = bsr_from_coo(coo)
    A = coo.as_dense()
    x = np.linspace(-1.0, 1.0, coo.nrow)
    y_pallas = np.asarray(bsr_matvec(bsr, x, use_pallas=True))
    np.testing.assert_allclose(y_pallas, A @ x, atol=1e-11)
    y_ein = np.asarray(bsr_matvec(bsr, x, use_pallas=False))
    np.testing.assert_allclose(y_ein, A @ x, atol=1e-11)
    X = np.random.default_rng(1).standard_normal((coo.nrow, 5))
    # SpMM: Pallas (interpret) and einsum fallback
    np.testing.assert_allclose(np.asarray(bsr_matmat(bsr, X,
                                                     use_pallas=True)),
                               A @ X, atol=1e-11)
    np.testing.assert_allclose(np.asarray(bsr_matmat(bsr, X,
                                                     use_pallas=False)),
                               A @ X, atol=1e-11)


def test_spgemm_block_product():
    from russell_tpu.sparse import samples
    from russell_tpu.sparse.kernels import bsr_from_coo, spgemm_plan, spgemm
    coo = samples.laplacian_2d(10)
    bsr = bsr_from_coo(coo, bm=16, bn=16)
    A = coo.as_dense()
    plan = spgemm_plan(bsr, bsr)
    for use_pallas in (True, False):   # Pallas accumulate kernel + fallback
        C, cij = spgemm(plan, bsr, bsr, use_pallas=use_pallas)
        Cd = np.zeros((bsr.n_rows_pad, bsr.n_rows_pad))
        for q in range(plan.c_blocks):
            i, j = cij[q]
            Cd[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16] += np.asarray(C[q])
        np.testing.assert_allclose(Cd[:coo.nrow, :coo.ncol], A @ A,
                                   atol=1e-11)


def test_laplacian_3d_generator():
    """7-point 3-D Laplacian generator (the large-benchmark operator,
    tools/bench_matrix_market.py): structure, symmetry, row sums, and a
    small SPLU solve against dense."""
    from russell_tpu.sparse import samples
    from russell_tpu.sparse import splu as _splu
    import jax.numpy as jnp

    coo = samples.laplacian_3d(4)
    n = 64
    assert coo.nrow == n
    A = np.asarray(coo.as_dense())
    np.testing.assert_allclose(A, A.T)              # symmetric when conv=0
    h2 = (1.0 / 3.0) ** 2
    assert A[0, 0] == 6.0 / h2
    # unsymmetric with convection
    coo_c = samples.laplacian_3d(4, conv=0.5)
    Ac = np.asarray(coo_c.as_dense())
    assert np.max(np.abs(Ac - Ac.T)) > 0
    # solve both through SPLU vs dense
    rng = np.random.default_rng(5)
    for mat, dense in ((coo, A), (coo_c, Ac)):
        ii, jj, vv = map(np.asarray, mat.triplets())
        plan = _splu.splu_analyze(n, ii, jj, block_size=8, ordering="nd")
        fac = _splu.splu_factorize(plan, jnp.asarray(vv))
        b = rng.normal(size=n)
        x = np.asarray(_splu.splu_solve(plan, fac, jnp.asarray(b)))
        assert np.max(np.abs(dense @ x - b)) < 1e-8 * np.max(np.abs(b))
