import os

import numpy as np
import pytest

from russell_tpu.core import array_approx_eq, approx_eq, complex_array_approx_eq
from russell_tpu.sparse import (
    CooMatrix, LinSolver, LinSolParams, Genie, VerifyLinSys,
    read_matrix_market, MMsym, samples,
)
from russell_tpu.sparse.enums import Ordering, Sym
from russell_tpu.sparse.ordering import rcm_ordering, mindeg_ordering, bandwidth


def _solve_and_check(sample_fn, genie=Genie.AUTO, tol=1e-10, params=None):
    coo, _, _, det = sample_fn()
    n = coo.nrow
    full = coo.as_dense()
    rng = np.random.default_rng(42)
    x_true = rng.standard_normal(n) if full.dtype.kind != "c" else (
        rng.standard_normal(n) + 1j * rng.standard_normal(n))
    rhs = full @ x_true
    solver = LinSolver(genie)
    solver.factorize(coo, params or LinSolParams(compute_determinant=True))
    x = np.asarray(solver.solve(rhs))
    array_approx_eq(np.abs(x - x_true), np.zeros(n), tol)
    m, base, e = solver.determinant()
    det_computed = m * base ** e
    approx_eq(abs(det_computed - det), 0.0, max(1e-10, abs(det) * 1e-10))
    return solver


def test_dense_tiny():
    _solve_and_check(samples.tiny_1x1)


def test_dense_umfpack_5x5():
    s = _solve_and_check(samples.umfpack_unsymmetric_5x5)
    assert s.plan.genie == Genie.DENSE
    # the canonical oracle: A x = b with x = 1..5
    coo, _, _, _ = samples.umfpack_unsymmetric_5x5()
    s2 = LinSolver()
    s2.factorize(coo)
    x = np.asarray(s2.solve(np.array([8.0, 45.0, -3.0, 3.0, 19.0])))
    array_approx_eq(x, [1, 2, 3, 4, 5], 1e-12)


def test_dense_mkl_5x5():
    _solve_and_check(samples.mkl_unsymmetric_5x5)


def test_symmetric_lower_storage():
    _solve_and_check(samples.mkl_positive_definite_5x5_lower)
    _solve_and_check(samples.mkl_symmetric_5x5_lower)
    _solve_and_check(samples.lower_symmetric_5x5)


def test_symmetric_upper_storage():
    _solve_and_check(samples.mkl_positive_definite_5x5_upper)
    _solve_and_check(samples.mkl_symmetric_5x5_upper)


def test_complex_dense():
    _solve_and_check(samples.complex_tiny_1x1)
    _solve_and_check(samples.umfpack_complex_unsymmetric_5x5)
    _solve_and_check(samples.complex_symmetric_3x3_lower)


def test_structure_must_not_change():
    coo, _, _, _ = samples.umfpack_unsymmetric_5x5()
    solver = LinSolver()
    solver.factorize(coo)
    solver.factorize(coo)  # same structure: fine
    other = CooMatrix.from_dense(np.eye(5))
    with pytest.raises(ValueError, match="same structure"):
        solver.factorize(other)


def test_solve_before_factorize_fails():
    with pytest.raises(RuntimeError, match="factorize"):
        LinSolver().solve(np.ones(3))


def test_rectangular_rejected():
    coo, _, _, _ = samples.rectangular_3x4()
    with pytest.raises(ValueError, match="square"):
        LinSolver().factorize(coo)


def test_singular_matrix_detected():
    coo = CooMatrix.from_dense(np.array([[1.0, 2.0], [2.0, 4.0]]), zero_tol=-1.0)
    with pytest.raises(RuntimeError, match="singular"):
        LinSolver().factorize(coo)


def _banded_problem(n=600, bw=5, seed=0):
    """Diagonally dominant banded system (exercises the BANDED path)."""
    rng = np.random.default_rng(seed)
    coo = CooMatrix(n, n, n * (2 * bw + 1))
    for i in range(n):
        coo.put(i, i, 10.0 + rng.random())
        for d in range(1, bw + 1):
            if i + d < n:
                coo.put(i, i + d, rng.standard_normal() * 0.5)
                coo.put(i + d, i, rng.standard_normal() * 0.5)
    return coo


def test_banded_path():
    coo = _banded_problem()
    full = coo.as_dense()
    x_true = np.linspace(1.0, 2.0, coo.nrow)
    rhs = full @ x_true
    solver = LinSolver(Genie.BANDED)
    solver.factorize(coo, LinSolParams(compute_determinant=True))
    assert solver.plan.genie == Genie.BANDED
    x = np.asarray(solver.solve(rhs))
    array_approx_eq(x, x_true, 1e-9)
    v = VerifyLinSys.from_system(coo, x, rhs)
    assert v.relative_error < 1e-12
    # determinant vs dense logdet oracle
    sign, logdet = np.linalg.slogdet(full)
    m, base, e = solver.determinant()
    approx_eq(np.log10(abs(m)) + e, logdet / np.log(10.0), 1e-8)
    assert np.sign(m) == sign


def test_banded_auto_selects():
    coo = _banded_problem(n=2000, bw=3)
    solver = LinSolver(Genie.AUTO)
    solver.factorize(coo)
    assert solver.plan.genie == Genie.BANDED
    full = coo.as_dense()
    x_true = np.ones(2000)
    x = np.asarray(solver.solve(full @ x_true))
    array_approx_eq(x, x_true, 1e-9)


def test_banded_refactorize_values_only():
    coo = _banded_problem(n=300, bw=4)
    solver = LinSolver(Genie.BANDED)
    solver.factorize(coo)
    # scale values by 3, refactorize with same structure
    coo.values[: coo.nnz] *= 3.0
    solver.factorize(coo)
    full = coo.as_dense()
    x_true = np.ones(300)
    x = np.asarray(solver.solve(full @ x_true))
    array_approx_eq(x, x_true, 1e-9)


def test_banded_complex():
    coo = _banded_problem(n=200, bw=3)
    ii, jj, vv = coo.triplets()
    cvals = vv + 1j * 0.3 * np.arange(1, len(vv) + 1) / len(vv)
    ccoo = CooMatrix.from_arrays(200, 200, ii, jj, cvals)
    full = ccoo.as_dense()
    x_true = np.ones(200) + 0.5j
    solver = LinSolver(Genie.BANDED)
    solver.factorize(ccoo)
    x = np.asarray(solver.solve(full @ x_true))
    complex_array_approx_eq(x, x_true, 1e-9)


def test_ordering_helpers():
    coo = _banded_problem(n=50, bw=2)
    ii, jj, _ = coo.triplets()
    assert bandwidth(ii, jj) == 2
    # random permutation destroys bandwidth; RCM should restore something small
    rng = np.random.default_rng(1)
    p = rng.permutation(50)
    pii, pjj = p[ii], p[jj]
    assert bandwidth(pii, pjj) > 10
    perm = rcm_ordering(50, pii, pjj)
    assert bandwidth(pii, pjj, perm) <= 6
    md = mindeg_ordering(50, pii, pjj)
    assert sorted(md.tolist()) == list(range(50))


BFWB62 = "/root/reference/russell_sparse/data/matrix_market/bfwb62.mtx"


@pytest.mark.skipif(not os.path.exists(BFWB62), reason="reference data not mounted")
def test_bfwb62_end_to_end():
    """End-to-end slice #1 (SURVEY.md §7.3): read bfwb62, solve, verify.

    The reference benchmark (solve_matrix_market.rs:217-230) checks
    componentwise |dx| <= 1e-10 against a stored solution for rhs=ones.
    We verify against a dense NumPy oracle at the same tolerance.
    """
    coo, _ = read_matrix_market(BFWB62, MMsym.LEAVE_AS_LOWER)
    assert coo.sym == Sym.YES_LOWER
    n = coo.nrow
    assert n == 62
    rhs = np.ones(n)
    solver = LinSolver(Genie.AUTO)
    solver.factorize(coo, LinSolParams(compute_determinant=True))
    x = np.asarray(solver.solve(rhs))
    x_oracle = np.linalg.solve(coo.as_dense(), rhs)
    array_approx_eq(x, x_oracle, 1e-10)
    v = VerifyLinSys.from_system(coo, x, rhs)
    assert v.relative_error < 1e-10
    # banded path must match too (it's a 62-dim banded matrix)
    solver_b = LinSolver(Genie.BANDED)
    solver_b.factorize(coo, LinSolParams(max_block=64))
    xb = np.asarray(solver_b.solve(rhs))
    array_approx_eq(xb, x_oracle, 1e-9)


def test_stats_json():
    coo, _, _, _ = samples.umfpack_unsymmetric_5x5()
    solver = LinSolver()
    solver.factorize(coo, LinSolParams(compute_determinant=True))
    solver.solve(np.ones(5))
    import json

    st = json.loads(solver.stats.get_json())
    assert st["matrix"]["nrow"] == 5
    assert st["main"]["platform"] == "russell_tpu"
    assert "factorize" in st["time_nanoseconds"]
    assert "factorize" in st["time_human"]


def test_splu_general_sparse():
    """General block-sparse LU (Genie.SPLU) with AMD ordering + fill."""
    import jax
    from russell_tpu.sparse import factor as _factor
    from russell_tpu.sparse import samples
    from russell_tpu.sparse.enums import Genie

    coo = samples.laplacian_2d(20)
    ii, jj, vv = coo.triplets()
    plan = _factor.analyze(coo.nrow, ii, jj, genie=Genie.SPLU)
    assert plan.splu_plan.fill_blocks > 0  # real fill-in happened
    fac = jax.jit(lambda d: _factor.numeric_factorize(plan, d))(vv)
    rhs = np.linspace(1.0, 2.0, coo.nrow)
    x = np.asarray(jax.jit(
        lambda f, b: _factor.factor_solve(plan, f, b))(fac, rhs))
    resid = np.max(np.abs(coo.as_dense() @ x - rhs))
    assert resid < 1e-10


def test_splu_unsymmetric_and_complex():
    import jax
    from russell_tpu.sparse import factor as _factor
    from russell_tpu.sparse.enums import Genie

    rng = np.random.default_rng(7)
    n = 150
    nnz = 1200
    rows = np.concatenate([rng.integers(0, n, nnz), np.arange(n)])
    cols = np.concatenate([rng.integers(0, n, nnz), np.arange(n)])
    vals = np.concatenate([rng.standard_normal(nnz), 8.0 * np.ones(n)])
    plan = _factor.analyze(n, rows, cols, genie=Genie.SPLU)
    fac = jax.jit(lambda d: _factor.numeric_factorize(plan, d))(vals)
    b = rng.standard_normal(n)
    x = np.asarray(jax.jit(
        lambda f, bb: _factor.factor_solve(plan, f, bb))(fac, b))
    A = np.zeros((n, n))
    np.add.at(A, (rows, cols), vals)
    assert np.max(np.abs(A @ x - b)) < 1e-9
    # complex values on the same structure (jit shape-stability contract)
    vals_c = vals + 0.25j * rng.standard_normal(len(vals))
    fac_c = jax.jit(lambda d: _factor.numeric_factorize(plan, d))(vals_c)
    xc = np.asarray(jax.jit(
        lambda f, bb: _factor.factor_solve(plan, f, bb))(
            fac_c, b.astype(np.complex128)))
    Ac = np.zeros((n, n), dtype=np.complex128)
    np.add.at(Ac, (rows, cols), vals_c)
    assert np.max(np.abs(Ac @ xc - b)) < 1e-9


def test_splu_via_lin_solver_bfwb62():
    from russell_tpu.sparse import (Genie, LinSolver, VerifyLinSys,
                                    read_matrix_market, samples)
    p = samples.bfwb62_path()
    if p is None:
        pytest.skip("reference data not mounted")
    coo, _ = read_matrix_market(p)
    s = LinSolver(Genie.SPLU)
    s.factorize(coo)
    rhs = np.ones(coo.nrow)
    x = s.solve(rhs)
    v = VerifyLinSys.from_system(coo, x, rhs)
    assert v.relative_error < 1e-10


def test_native_symbolic_engine():
    """C++ native orderings/fill agree in contract with Python fallbacks."""
    from russell_tpu import native
    from russell_tpu.sparse import samples
    if not native.available():
        pytest.skip("no C++ toolchain")
    coo = samples.laplacian_2d(12)
    ii, jj, _ = coo.triplets()
    n = coo.nrow
    p = native.rcm_order(n, ii, jj)
    assert sorted(p.tolist()) == list(range(n))
    assert bandwidth(ii, jj, p) <= bandwidth(ii, jj) + 5
    p2 = native.mindeg_order(n, ii, jj)
    assert sorted(p2.tolist()) == list(range(n))
    # block fill: superset of the base pattern, closed under elimination
    bi = np.asarray(ii) // 16
    bj = np.asarray(jj) // 16
    nb = -(-n // 16)
    filled = native.block_fill(nb, bi, bj)
    pat = set(map(tuple, filled.tolist()))
    assert set(zip(bi.tolist(), bj.tolist())) <= pat
    for k in range(nb):
        assert (k, k) in pat


def test_mixed_precision_refinement():
    """f32 factorization + f64 iterative refinement reaches ~f64 accuracy
    (the TPU strategy: no native f64 LU kernel on the MXU path)."""
    import jax
    from russell_tpu.sparse import factor as _factor
    from russell_tpu.sparse import samples
    from russell_tpu.sparse.enums import Genie

    coo = samples.laplacian_2d(18)
    ii, jj, vv = coo.triplets()
    rhs = np.linspace(1.0, 2.0, coo.nrow)
    A = coo.as_dense()
    for genie in (Genie.DENSE, Genie.BANDED, Genie.SPLU):
        plan = _factor.analyze(coo.nrow, ii, jj, genie=genie,
                               mixed_precision=True)
        fac = jax.jit(lambda d, p=plan: _factor.numeric_factorize(p, d))(vv)
        assert fac["lus" if genie == Genie.BANDED else
                   ("blocks" if genie == Genie.SPLU else "lu")].dtype == \
            np.float32
        x = np.asarray(jax.jit(
            lambda f, b, p=plan: _factor.factor_solve(p, f, b))(fac, rhs))
        assert x.dtype == np.float64
        assert np.max(np.abs(A @ x - rhs)) < 1e-11, genie


def test_bcr_banded_kernel():
    """Block cyclic reduction matches the sequential scan kernel."""
    import jax
    from russell_tpu.sparse import factor as _factor
    from russell_tpu.sparse import samples

    coo = samples.laplacian_2d(30)  # nb big enough for several BCR levels
    ii, jj, vv = coo.triplets()
    rhs = np.linspace(1.0, 2.0, coo.nrow)
    plan_scan = _factor.analyze(coo.nrow, ii, jj, genie=Genie.BANDED,
                                banded_kernel="scan")
    plan_bcr = _factor.analyze(coo.nrow, ii, jj, genie=Genie.BANDED,
                               banded_kernel="bcr")
    assert not plan_scan.use_bcr and plan_bcr.use_bcr
    xs = []
    for plan in (plan_scan, plan_bcr):
        fac = jax.jit(lambda d, p=plan: _factor.numeric_factorize(p, d))(vv)
        x = np.asarray(jax.jit(
            lambda f, b, p=plan: _factor.factor_solve(p, f, b))(fac, rhs))
        xs.append(x)
        # determinants agree with the dense oracle
        sign, logdet = np.linalg.slogdet(coo.as_dense())
        got = float(fac["logdet"]) - float(
            np.sum(np.log(np.asarray(fac["rs"])))
            + np.sum(np.log(np.asarray(fac["cs"]))))
        assert abs(got - logdet) < 1e-6
    np.testing.assert_allclose(xs[0], xs[1], atol=1e-10)


def test_splu_nested_dissection_level_batched():
    # ND ordering must produce a low-depth elimination tree and the
    # level-batched numeric phase must agree with the sequential one
    import jax
    import jax.numpy as jnp
    from russell_tpu.sparse import samples as _samples
    from russell_tpu.sparse import splu as _splu

    coo = _samples.laplacian_2d(32)
    ii, jj, vv = map(np.asarray, coo.triplets())
    n = coo.nrow
    plan_nd = _splu.splu_analyze(n, ii, jj, block_size=16, ordering="nd")
    plan_amd = _splu.splu_analyze(n, ii, jj, block_size=16, ordering="amd")
    assert plan_nd.lvl_cols.shape[0] < plan_nd.nb          # real parallelism
    assert plan_nd.nblk < plan_amd.nblk                    # less fill too
    fac = _splu.splu_factorize(plan_nd, jnp.asarray(vv))
    b = np.linspace(1.0, 2.0, n)
    x = _splu.splu_solve(plan_nd, fac, jnp.asarray(b))
    A = np.asarray(coo.as_dense())
    assert np.max(np.abs(A @ np.asarray(x) - b)) < 1e-10
    # sequential reference on the same plan
    plan_seq = _splu.splu_analyze(n, ii, jj, block_size=16, ordering="nd")
    plan_seq.lvl_cols = None
    fac2 = _splu.splu_factorize(plan_seq, jnp.asarray(vv))
    x2 = _splu.splu_solve(plan_seq, fac2, jnp.asarray(b))
    assert np.max(np.abs(np.asarray(x) - np.asarray(x2))) < 1e-9
    assert abs(float(fac["logdet"]) - float(fac2["logdet"])) < 1e-8


def test_nd_separator_quality_and_packed_schedule():
    # the ND splitter must not emit giant regions (disconnected leftovers
    # once collapsed whole levels into dense leaves — a 100x fill bug)
    from russell_tpu.ode import samples as _osamples
    from russell_tpu.sparse import splu as _splu
    from russell_tpu.sparse.ordering import nd_ordering

    system, _t0, _y0, _args = _osamples.brusselator_pde(2e-3, 33)
    st = system.jac_structure
    ii, jj = np.asarray(st[0]), np.asarray(st[1])
    n = system.ndim
    order, sizes = nd_ordering(n, ii, jj, leaf=64, with_regions=True)
    assert sorted(order.tolist()) == list(range(n))      # permutation
    assert int(np.max(sizes)) <= 6 * 33                  # ~separator scale
    plan = _splu.splu_analyze(n, ii, jj, block_size=32, ordering="nd")
    pk = plan.packed
    assert len(pk["r_type"]) < plan.nb                   # real batching
    # left-looking schedule invariants: contiguous non-overlapping
    # target ranges that cover all stored blocks exactly once
    spans = sorted(zip(pk["t0"].tolist(), pk["len"].tolist()))
    covered = 0
    prev_end = 1
    for t0, ln in spans:
        assert t0 == prev_end
        prev_end = t0 + ln
        covered += ln
    assert covered == plan.nblk - 1


def test_splu_pair_factorize_solve_matches_separate():
    # real+complex in ONE scan must equal two separate factorizations
    import jax.numpy as jnp
    from russell_tpu.sparse import samples as _samples
    from russell_tpu.sparse import factor as _factor
    from russell_tpu.sparse.enums import Genie

    coo = _samples.laplacian_2d(10)
    ii, jj, vv = map(np.asarray, coo.triplets())
    n = coo.nrow
    rng = np.random.default_rng(3)
    vc = vv.astype(complex) * (1.0 + 0.3j) + 0.05j * rng.standard_normal(
        len(vv))
    plan = _factor.analyze(n, ii, jj, genie=Genie.SPLU)
    fr, fc = _factor.numeric_factorize_pair(plan, jnp.asarray(vv),
                                            jnp.asarray(vc))
    fr2 = _factor.numeric_factorize(plan, jnp.asarray(vv))
    fc2 = _factor.numeric_factorize(plan, jnp.asarray(vc))
    assert np.allclose(np.asarray(fr["blocks"]), np.asarray(fr2["blocks"]))
    assert np.allclose(np.asarray(fc["blocks"]), np.asarray(fc2["blocks"]))
    br = np.linspace(1.0, 2.0, n)
    bc = br + 0.5j
    xr, xc = _factor.factor_solve_pair(plan, fr, fc, jnp.asarray(br),
                                       jnp.asarray(bc))
    xr2 = _factor.factor_solve(plan, fr2, jnp.asarray(br))
    xc2 = _factor.factor_solve(plan, fc2, jnp.asarray(bc))
    assert np.max(np.abs(np.asarray(xr) - np.asarray(xr2))) < 1e-12
    assert np.max(np.abs(np.asarray(xc) - np.asarray(xc2))) < 1e-12
    A = np.asarray(coo.as_dense())
    assert np.max(np.abs(A @ np.asarray(xr) - br)) < 1e-9
    Ac = np.zeros((n, n), complex)
    for i, j, v in zip(ii, jj, vc):
        Ac[i, j] += v
    assert np.max(np.abs(Ac @ np.asarray(xc) - bc)) < 1e-9


def test_splu_determinant_sign():
    # SPLU phase must be the SIGNED determinant (MUMPS ICNTL(33) analog):
    # negate the Laplacian on an odd n so det < 0
    import jax.numpy as jnp
    from russell_tpu.sparse import samples as _samples
    from russell_tpu.sparse import splu as _splu

    coo = _samples.laplacian_2d(5)          # n = 25 (odd)
    ii, jj, vv = map(np.asarray, coo.triplets())
    n = coo.nrow
    A = np.asarray(coo.as_dense())
    for scale in (1.0, -1.0):
        sign_ref, logdet_ref = np.linalg.slogdet(scale * A)
        plan = _splu.splu_analyze(n, ii, jj, block_size=8)
        fac = _splu.splu_factorize(plan, jnp.asarray(scale * vv))
        assert float(fac["phase"]) == sign_ref
        assert abs(float(fac["logdet"]) - logdet_ref) < 1e-8
    assert np.linalg.slogdet(-A)[0] == -1.0  # the case actually bites


def test_splu_determinant_sign_via_lin_solver():
    # end-to-end determinant through LinSolver with Genie.SPLU forced
    coo, _, _, _ = samples.umfpack_unsymmetric_5x5()
    ii, jj, vv = coo.triplets()
    A = coo.as_dense()
    neg = CooMatrix(coo.nrow, coo.ncol, len(np.asarray(vv)))
    for i, j, v in zip(np.asarray(ii), np.asarray(jj), np.asarray(vv)):
        neg.put(int(i), int(j), -float(v))
    det_ref = np.linalg.det(-A)
    assert det_ref < 0
    solver = LinSolver(Genie.SPLU)
    solver.factorize(neg, LinSolParams(compute_determinant=True))
    m, base, e = solver.determinant()
    approx_eq(m * base ** e, det_ref, abs(det_ref) * 1e-8)


def test_splu_pallas_interpret_parity(monkeypatch):
    # force the Pallas pair-contraction kernel in interpret mode on CPU
    # and check it reproduces the XLA segment-sum path bit-for-bit
    import jax.numpy as jnp
    from russell_tpu.sparse import samples as _samples
    from russell_tpu.sparse import splu as _splu

    coo = _samples.laplacian_2d(8)
    ii, jj, vv = map(np.asarray, coo.triplets())
    n = coo.nrow
    plan = _splu.splu_analyze(n, ii, jj, block_size=32)
    monkeypatch.setenv("RUSSELL_TPU_SPLU_PALLAS", "0")
    fac_x = _splu.splu_factorize(plan, jnp.asarray(vv, dtype=np.float32))
    monkeypatch.setenv("RUSSELL_TPU_SPLU_PALLAS", "1")
    assert _splu._pallas_mode() == (True, True)   # interpret off-TPU
    fac_p = _splu.splu_factorize(plan, jnp.asarray(vv, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(fac_p["blocks"]),
                               np.asarray(fac_x["blocks"]),
                               rtol=1e-6, atol=1e-6)
    # complex planes layout through the same kernel
    vc = (vv + 0.25j * vv).astype(np.complex64)
    monkeypatch.setenv("RUSSELL_TPU_SPLU_PALLAS", "0")
    fc_x = _splu.splu_factorize(plan, jnp.asarray(vc))
    monkeypatch.setenv("RUSSELL_TPU_SPLU_PALLAS", "1")
    fc_p = _splu.splu_factorize(plan, jnp.asarray(vc))
    np.testing.assert_allclose(np.asarray(fc_p["blocks"]),
                               np.asarray(fc_x["blocks"]),
                               rtol=1e-5, atol=1e-5)


def test_splu_gather_kernel_interpret_parity(monkeypatch):
    # force the Pallas DMA row-gather kernel (the TPU factorize scan's
    # gather path — XLA row gathers cost ~300ns each there) in interpret
    # mode on CPU; must be bit-identical to the XLA gather path for both
    # the real layout and the complex K-embedding
    import jax.numpy as jnp
    from russell_tpu.sparse import splu as _splu

    coo = samples.laplacian_2d(12)
    ii, jj, vv = map(np.asarray, coo.triplets())
    plan = _splu.splu_analyze(coo.nrow, ii, jj, block_size=32)
    pk = plan.packed
    assert pk["pair_l"].shape[1] % 64 == 0 and pk["TL"] % 64 == 0
    vv32 = np.asarray(vv, dtype=np.float32)
    vc = (vv32 + 0.25j * vv32).astype(np.complex64)
    monkeypatch.setenv("RUSSELL_TPU_SPLU_GATHER", "xla")
    fr_x, fc_x = _splu.splu_factorize_multi(plan, (vv32, vc))
    monkeypatch.setenv("RUSSELL_TPU_SPLU_GATHER", "pallas")
    assert _splu._gather_mode() == (True, True)   # interpret off-TPU
    fr_p, fc_p = _splu.splu_factorize_multi(plan, (vv32, vc))
    for a, b in ((fr_x, fr_p), (fc_x, fc_p)):
        np.testing.assert_array_equal(np.asarray(a["blocks"]),
                                      np.asarray(b["blocks"]))
        np.testing.assert_array_equal(np.asarray(a["logdet"]),
                                      np.asarray(b["logdet"]))
    # solve through the gathered factors stays correct
    x = _splu.splu_solve(plan, fr_p, np.ones(coo.nrow, np.float32))
    r = np.zeros(coo.nrow)
    np.add.at(r, ii, vv32 * np.asarray(x)[jj])
    assert np.max(np.abs(r - 1.0)) < 1e-4


def test_error_analysis_and_condition_numbers():
    # compute_error_estimates / compute_condition_numbers wired into
    # solve (MUMPS ICNTL(11) / RINFOG analogs, lin_sol_params.rs:52-57)
    coo, _, _, _ = samples.umfpack_unsymmetric_5x5()
    A = coo.as_dense()
    x_true = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    rhs = A @ x_true
    solver = LinSolver(Genie.DENSE)
    solver.factorize(coo, LinSolParams(compute_error_estimates=True,
                                       compute_condition_numbers=True))
    x = np.asarray(solver.solve(rhs))
    ms = solver.stats.mumps_stats
    # exact-solve backward errors are at rounding level
    assert 0.0 <= ms["backward_error_omega1"] < 1e-13
    assert 0.0 <= ms["backward_error_omega2"] < 1e-13
    assert 0.0 <= ms["normalized_delta_x"] < 1e-12
    assert ms["inf_norm_a"] == np.max(np.abs(A).sum(axis=1))
    assert abs(ms["inf_norm_x"] - 5.0) < 1e-12
    # power-iteration estimates bound the true condition number from
    # below and should land within a small factor for this 5x5
    c1_true = np.linalg.cond(A, np.inf)
    c2_true = np.linalg.cond(A, 1)
    assert ms["condition_number1"] <= c1_true * (1 + 1e-10)
    assert ms["condition_number1"] > c1_true / 10
    assert ms["condition_number2"] <= c2_true * (1 + 1e-10)
    assert ms["condition_number2"] > c2_true / 10
    rc = solver.stats.output["umfpack_rcond_estimate"]
    assert 0 < rc <= 1.0 and abs(rc - 1.0 / ms["condition_number1"]) < 1e-12
    # also exercised on the SPLU path (packed substitution solves)
    coo2 = samples.laplacian_2d(8)
    s2 = LinSolver(Genie.SPLU)
    s2.factorize(coo2, LinSolParams(compute_error_estimates=True))
    b2 = np.linspace(1.0, 2.0, coo2.nrow)
    s2.solve(b2)
    assert s2.stats.mumps_stats["backward_error_omega1"] < 1e-12


def test_newton_nonlinear_system_through_lin_solver():
    """4-eq Newton iteration re-factorizing the frozen-structure
    Jacobian every step (russell_sparse/tests/test_nonlinear_system.rs:
    same residual/Jacobian, same per-iteration iterate table, converges
    in exactly 5 iterations)."""
    from russell_tpu.sparse import CooMatrix, LinSolver

    def residual(u):
        d1, d2, d3, d4 = u
        return np.array([
            2*d1 + d1**4 + d2 + 3*d1*d2*d2 - 9*d4 + d4**4 - 0.2,
            d1 + 3*d1*d1*d2 + 10*d2 + 4*d2*d2 + 2*d2*d3 - 8*d3 + 7*d4 + 0.1,
            -8*d2 + d2*d2 + 3*d3 + d3*d3 + 2*d4,
            -9*d1 + 4*d1*d4**3 + 7*d2 + 2*d3 + 5*d4 - 0.5])

    def jacobian(jj, u):
        d1, d2, d3, d4 = u
        jj.reset()
        jj.put(0, 0, 2 + 4*d1**3 + 3*d2*d2)
        jj.put(0, 1, 1 + 6*d1*d2)
        jj.put(0, 2, 0.0)
        jj.put(0, 3, -9 + 4*d4**3)
        jj.put(1, 0, 1 + 6*d1*d2)
        jj.put(1, 1, 10 + 3*d1*d1 + 8*d2 + 2*d3)
        jj.put(1, 2, -8 + 2*d2)
        jj.put(1, 3, 7.0)
        jj.put(2, 0, 0.0)
        jj.put(2, 1, -8 + 2*d2)
        jj.put(2, 2, 3 + 2*d3)
        jj.put(2, 3, 2.0)
        jj.put(3, 0, -9 + 4*d4**3)
        jj.put(3, 1, 7.0)
        jj.put(3, 2, 2.0)
        jj.put(3, 3, 5 + 12*d1*d4*d4)

    uu_ref = np.array([
        [0.000000, 0.000000, 0.000000, 0.000000],
        [-0.236393, -0.106230, -0.225574, -0.086557],
        [-0.196773, -0.079071, -0.171604, -0.074904],
        [-0.194395, -0.077412, -0.168376, -0.074249],
        [-0.194386, -0.077406, -0.168364, -0.074246],
        [-0.194386, -0.077406, -0.168364, -0.074246]])

    jj = CooMatrix(4, 4, 16)
    jacobian(jj, np.zeros(4))
    solver = LinSolver()
    u = np.zeros(4)
    norm0 = None
    it = 0
    while it < 10:
        rr = residual(u)
        err = 1.0 if it == 0 else np.linalg.norm(rr) / norm0
        if it == 0:
            norm0 = np.linalg.norm(rr)
        np.testing.assert_allclose(u, uu_ref[it], atol=1e-6)
        if err < 1e-13:
            break
        jacobian(jj, u)
        solver.factorize(jj)      # same structure: numeric-only re-run
        u = u - np.asarray(solver.solve(rr))
        it += 1
    assert it == 5


def test_precision_escalation_on_extreme_conditioning():
    # LAPACK-dsgesv-style fallback: kappa ~ 1e9 makes f32 factors a
    # useless preconditioner (kappa * eps32 >> 1), so refinement and
    # FGMRES-IR cannot reach input-precision backward error; the solver
    # must refactorize at full precision ONCE and record it
    import numpy as np
    import jax.numpy as jnp
    from russell_tpu.sparse import (CooMatrix, Genie, LinSolver,
                                    LinSolParams, VerifyLinSys)

    n = 60
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    d = np.logspace(0, 9, n)
    A = (q * d) @ q.T
    ii, jj = np.nonzero(np.ones((n, n)))
    vals = A[ii, jj]
    m = CooMatrix.from_arrays(n, n, ii, jj, vals)
    sol = LinSolver(Genie.AUTO)
    sol.factorize(m, LinSolParams(mixed_precision=True))
    b = np.ones(n)
    x = sol.solve(b)
    assert sol.stats.output.get("precision_escalated") is True
    v = VerifyLinSys.from_system(m, x, b)
    assert v.relative_error < 1e-10
    # second solve reuses the escalated factors (no re-escalation churn)
    x2 = sol.solve(np.arange(1.0, n + 1.0))
    assert np.all(np.isfinite(np.asarray(x2)))


def test_no_escalation_when_mixed_precision_suffices():
    import numpy as np
    from russell_tpu.sparse import Genie, LinSolver, LinSolParams, samples

    coo = samples.laplacian_2d(24)
    sol = LinSolver(Genie.GRIDMF)
    sol.factorize(coo, LinSolParams(grid=(24, 24, 1),
                                    mixed_precision=True))
    sol.solve(np.ones(coo.nrow))
    assert "precision_escalated" not in sol.stats.output


def test_symmetric_values_detection_and_fcg_tier():
    # the host symmetry check must recognize a numerically symmetric
    # full-storage matrix (unlocking the FCG refinement tier) and reject
    # an unsymmetric one; the detected path must still hit the 1e-10 bar
    # with f32 factors (the laplacian_2d_1000 regime at test scale)
    import numpy as np
    from russell_tpu.sparse import (Genie, LinSolver, LinSolParams,
                                    VerifyLinSys, samples)

    coo = samples.laplacian_2d(32)
    sol = LinSolver(Genie.GRIDMF)
    sol.factorize(coo, LinSolParams(grid=(32, 32, 1),
                                    mixed_precision=True))
    assert sol.plan.symmetric_values is True
    b = np.ones(coo.nrow)
    x = sol.solve(b)
    v = VerifyLinSys.from_system(coo, x, b)
    assert v.relative_error < 1e-10
    assert "precision_escalated" not in sol.stats.output

    # unsymmetric convection-diffusion: detection must say no, and the
    # FGMRES tier must still carry the solve to the bar
    coo_u = samples.conv_diff_2d(24, peclet=0.5) if hasattr(
        samples, "conv_diff_2d") else None
    if coo_u is None:
        ii = np.asarray(coo.indices_i[:coo.nnz]).copy()
        jj = np.asarray(coo.indices_j[:coo.nnz]).copy()
        vv = np.asarray(coo.values[:coo.nnz]).astype(np.float64).copy()
        vv[ii > jj] *= 1.25        # break value symmetry, keep pattern
        from russell_tpu.sparse import CooMatrix
        coo_u = CooMatrix.from_arrays(coo.nrow, coo.ncol, ii, jj, vv)
    sol_u = LinSolver(Genie.GRIDMF)
    sol_u.factorize(coo_u, LinSolParams(grid=(32, 32, 1),
                                        mixed_precision=True))
    assert sol_u.plan.symmetric_values is False
    x_u = sol_u.solve(b)
    v_u = VerifyLinSys.from_system(coo_u, x_u, b)
    assert v_u.relative_error < 1e-10


def test_fcg_tier_out_of_core_eager(monkeypatch):
    # the eager (out-of-core) adaptive branch routes symmetric systems
    # through the python FCG loop; must match the in-core answer
    import numpy as np
    from russell_tpu.sparse import (Genie, LinSolver, LinSolParams,
                                    VerifyLinSys, samples)

    monkeypatch.setenv("RUSSELL_TPU_GRIDMF_MEM_GB", "1e-9")
    coo = samples.laplacian_2d(24)
    sol = LinSolver(Genie.GRIDMF)
    sol.factorize(coo, LinSolParams(grid=(24, 24, 1),
                                    mixed_precision=True))
    assert sol.plan.gridmf_ooc
    assert sol.plan.symmetric_values is True
    b = np.sin(np.arange(coo.nrow))
    x = sol.solve(b)
    v = VerifyLinSys.from_system(coo, x, b)
    assert v.relative_error < 1e-10


def test_splu_complex_determinant_phase():
    # MUMPS ICNTL(33) full COMPLEX determinant (interface_mumps.c:203-206
    # contract): the K-embedding loses the phase in the factorize loop;
    # splu_det_phase must recover it from the stored diagonal inverse
    # blocks.  Oracle: numpy det of the dense assembled matrix.
    import jax.numpy as jnp
    from russell_tpu.sparse import CooMatrix, Genie
    from russell_tpu.sparse import splu as _splu

    rng = np.random.default_rng(7)
    n = 18
    coo = CooMatrix(n, n, 400, dtype=np.complex128)
    for k in range(n):                       # dominant diagonal
        coo.put(k, k, complex(3.0 + rng.normal(), rng.normal()))
    for _ in range(60):
        i, j = rng.integers(0, n, 2)
        coo.put(int(i), int(j), complex(rng.normal(), rng.normal()))
    A = np.asarray(coo.as_dense())
    det_ref = np.linalg.det(A)
    phase_ref = det_ref / abs(det_ref)

    # direct engine-level check
    ii, jj, vv = map(np.asarray, coo.triplets())
    plan = _splu.splu_analyze(n, ii, jj, block_size=8)
    fac = _splu.splu_factorize(plan, jnp.asarray(vv))
    pri = np.asarray(_splu.splu_det_phase(plan, fac))
    got = complex(pri[0], pri[1])
    assert abs(got - phase_ref) < 1e-6
    assert abs(abs(got) - 1.0) < 1e-6
    # |det| from the embedding still exact
    assert abs(float(fac["logdet"]) - np.log(abs(det_ref))) < 1e-8

    # through the LinSolver determinant surface
    solver = LinSolver(Genie.SPLU)
    solver.factorize(coo, LinSolParams(compute_determinant=True))
    m, base, e = solver.determinant()
    det_got = m * base ** e
    assert abs(det_got - det_ref) / abs(det_ref) < 1e-6

    # real input keeps the exact +-1 sign through the same surface
    pri_r = np.asarray(_splu.splu_det_phase(
        *_real_phase_case()))
    assert pri_r[1] == 0.0 and pri_r[0] in (-1.0, 1.0)


def _real_phase_case():
    import jax.numpy as jnp
    from russell_tpu.sparse import samples as _samples
    from russell_tpu.sparse import splu as _splu
    coo = _samples.laplacian_2d(5)
    ii, jj, vv = map(np.asarray, coo.triplets())
    plan = _splu.splu_analyze(coo.nrow, ii, jj, block_size=8)
    fac = _splu.splu_factorize(plan, jnp.asarray(-np.asarray(vv)))
    return plan, fac


def test_complex_mixed_precision_plain_solve_f64_accurate():
    # VERDICT r4 item 6: plain solve() on a complex128 system under
    # mixed precision must route through the f64-plane refinement
    # (factor_solve_planes) and reach the reference's accuracy class
    # (complex_solver_umfpack.rs tests hit ~1e-15), not the ~2e-8 c64
    # array-API floor.
    import numpy as np
    from russell_tpu.sparse import (CooMatrix, Genie, LinSolver,
                                    LinSolParams)

    n = 80
    rng = np.random.default_rng(7)
    A = np.zeros((n, n), dtype=np.complex128)
    for k in range(n):
        A[k, k] = 4.0 + rng.normal() + 1j * rng.normal()
    for _ in range(4 * n):
        i, j = rng.integers(0, n, size=2)
        A[i, j] += 0.3 * (rng.normal() + 1j * rng.normal())
    ii, jj = np.nonzero(A != 0)
    m = CooMatrix.from_arrays(n, n, ii, jj, A[ii, jj])
    sol = LinSolver(Genie.AUTO)
    sol.factorize(m, LinSolParams(mixed_precision=True))
    b = rng.normal(size=n) + 1j * rng.normal(size=n)
    x = np.asarray(sol.solve(b))
    assert x.dtype == np.complex128
    x_true = np.linalg.solve(A, b)
    rel = np.max(np.abs(x - x_true)) / np.max(np.abs(x_true))
    assert rel < 1e-12

    # a REAL rhs on the complex system must take the same f64 route
    br = rng.normal(size=n)
    xr = np.asarray(sol.solve(br))
    rel_r = (np.max(np.abs(xr - np.linalg.solve(A, br)))
             / np.max(np.abs(xr)))
    assert rel_r < 1e-12
