"""Matrix norms, matrix multiplication and matrix-vector products
(mirrors russell_lab examples/matrix_norms.rs, matrix_multiplication.rs,
matrix_vector_multiplication.rs, matvec_solve_linear_system.rs)."""
import _prelude  # noqa: F401
import numpy as np
import jax.numpy as jnp
from russell_tpu.core import Norm
from russell_tpu.dense import (mat_mat_mul, mat_norm, mat_t_mat_mul,
                               mat_vec_mul, solve_lin_sys)

A = jnp.asarray([[2.0, 1.0, 0.0],
                 [1.0, 3.0, 1.0],
                 [0.0, 1.0, 4.0]])

# norms (matrix_norms.rs): One = max col sum, Inf = max row sum,
# Fro = Frobenius, Max = max |a_ij|
an = np.asarray(A)
assert float(mat_norm(A, Norm.ONE)) == np.abs(an).sum(axis=0).max()
assert float(mat_norm(A, Norm.INF)) == np.abs(an).sum(axis=1).max()
assert abs(float(mat_norm(A, Norm.FRO)) - np.linalg.norm(an, "fro")) < 1e-14
assert float(mat_norm(A, Norm.MAX)) == 4.0

# C = alpha A B and C = alpha A^T B (matrix_multiplication.rs)
B = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
C = mat_mat_mul(2.0, A, B)
assert np.allclose(np.asarray(C), 2.0 * an @ np.asarray(B))
Ct = mat_t_mat_mul(1.0, A, A)
assert np.allclose(np.asarray(Ct), an.T @ an)

# v = alpha A u (matrix_vector_multiplication.rs)
u = jnp.asarray([1.0, 2.0, 3.0])
v = mat_vec_mul(1.0, A, u)
assert np.allclose(np.asarray(v), an @ np.asarray(u))

# dense linear solve (matvec_solve_linear_system.rs)
b = jnp.asarray([4.0, 9.0, 14.0])
x = solve_lin_sys(A, b)
assert np.allclose(np.asarray(A @ x), np.asarray(b), atol=1e-12)
print("x =", np.asarray(x))
print("matrix norms/mul OK")
