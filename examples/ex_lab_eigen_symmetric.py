"""Symmetric eigenproblems: mat_eigen_sym (LAPACK-role) vs the native
Jacobi-rotation twin (mirrors russell_lab/examples/
matrix_eigenvalues_symmetric.rs and matrix_eigenvalues_symmetric_3x3.rs;
the dual-implementation cross-check is the reference's own test idea)."""
import _prelude  # noqa: F401
import numpy as np
import jax.numpy as jnp
from russell_tpu.dense import mat_eigen_sym, mat_eigen_sym_jacobi

A = jnp.asarray([[2.0, 0.0, 0.0],
                 [0.0, 3.0, 4.0],
                 [0.0, 4.0, 9.0]])
l, v = mat_eigen_sym(A)
lj, vj = mat_eigen_sym_jacobi(A)
print("eigenvalues (lapack-role):", np.asarray(l))
print("eigenvalues (jacobi):", np.sort(np.asarray(lj)))
assert np.allclose(np.sort(np.asarray(l)), [1.0, 2.0, 11.0])
assert np.allclose(np.sort(np.asarray(lj)), np.sort(np.asarray(l)), atol=1e-12)
# residual A v = lambda v
for k in range(3):
    r = np.asarray(A) @ np.asarray(v)[:, k] - float(np.asarray(l)[k]) * np.asarray(v)[:, k]
    assert np.max(np.abs(r)) < 1e-12
# 5x5 case
rng = np.random.default_rng(3)
M = rng.normal(size=(5, 5)); M = (M + M.T) / 2
l5, v5 = mat_eigen_sym(jnp.asarray(M))
assert np.allclose(np.sort(np.asarray(l5)), np.sort(np.linalg.eigvalsh(M)))
print("symmetric eigen OK")
