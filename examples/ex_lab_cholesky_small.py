"""Cholesky factorization of small SPD matrices (mirrors
russell_lab/examples/matrix_cholesky_3x3.rs and matrix_cholesky_4x4.rs)."""
import _prelude  # noqa: F401
import numpy as np
import jax.numpy as jnp
from russell_tpu.dense import mat_cholesky

A3 = jnp.asarray([[4.0, 12.0, -16.0],
                  [12.0, 37.0, -43.0],
                  [-16.0, -43.0, 98.0]])
L3 = mat_cholesky(A3)
assert np.allclose(np.asarray(L3) @ np.asarray(L3).T, np.asarray(A3))
print("L(3x3) =\n", np.array2string(np.asarray(L3), precision=4))

A4 = jnp.asarray([[2.0, 1.0, 1.0, 1.0],
                  [1.0, 3.0, 1.0, 1.0],
                  [1.0, 1.0, 4.0, 1.0],
                  [1.0, 1.0, 1.0, 5.0]])
L4 = mat_cholesky(A4)
assert np.allclose(np.asarray(L4) @ np.asarray(L4).T, np.asarray(A4))
# solve A x = b through the factor
b = np.asarray([1.0, 2.0, 3.0, 4.0])
y = np.linalg.solve(np.asarray(L4), b)
x = np.linalg.solve(np.asarray(L4).T, y)
assert np.allclose(np.asarray(A4) @ x, b)
print("x =", np.array2string(x, precision=6))
print("cholesky OK")
