"""Complex matrix norms and multiplication (mirrors
russell_lab/examples/complex_matrix_norms.rs and
complex_matrix_multiplication.rs)."""
import _prelude  # noqa: F401
import numpy as np
import jax.numpy as jnp
from russell_tpu.core import Norm
from russell_tpu.dense import mat_norm, mat_mat_mul

A = jnp.asarray([[1 + 1j, 2 - 1j, 0.5j],
                 [3 + 0j, -1 + 2j, 1 - 1j]])
An = np.asarray(A)
assert abs(float(mat_norm(A, Norm.ONE)) - np.linalg.norm(An, 1)) < 1e-14
assert abs(float(mat_norm(A, Norm.INF)) - np.linalg.norm(An, np.inf)) < 1e-14
assert abs(float(mat_norm(A, Norm.FRO)) - np.linalg.norm(An, "fro")) < 1e-14
assert abs(float(mat_norm(A, Norm.MAX)) - np.max(np.abs(An))) < 1e-14
B = jnp.asarray([[1 - 1j, 0j], [2j, 1 + 0j], [1 + 1j, -1j]])
C = mat_mat_mul(0.5 - 2.0j, A, B)
assert np.allclose(np.asarray(C), (0.5 - 2.0j) * (An @ np.asarray(B)))
print("one-norm:", float(mat_norm(A, Norm.ONE)),
      "fro:", float(mat_norm(A, Norm.FRO)))
print("alpha*A*B =\n", np.round(np.asarray(C), 4))
print("complex matrix norms/mul OK")
