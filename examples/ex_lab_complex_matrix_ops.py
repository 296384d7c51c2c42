"""Complex matrix operations: zip/unzip between real-pair and complex
storage, complex matmul and norms (mirrors russell_lab
examples/complex_matrix_multiplication.rs, complex_matrix_norms.rs)."""
import _prelude  # noqa: F401
import numpy as np
import jax.numpy as jnp
from russell_tpu.core import Norm
from russell_tpu.dense import (complex_mat_unzip, complex_mat_zip,
                               mat_mat_mul, mat_norm, mat_vec_mul)

A = jnp.asarray([[1 + 1j, 2.0, 0 + 1j],
                 [3 - 1j, 1 - 1j, 1.0],
                 [0.0, 2 + 2j, -1 + 0.5j]])

# zip/unzip round trip: (real, imag) planes <-> complex storage
re, im = complex_mat_unzip(A)
A2 = complex_mat_zip(re, im)
assert np.allclose(np.asarray(A2), np.asarray(A))

# complex matrix multiplication against numpy
B = jnp.asarray([[1.0, 0 + 1j], [2 - 1j, 1.0], [0.0, 3 + 0j]])
C = mat_mat_mul(1.0 + 0j, A, B)
assert np.allclose(np.asarray(C), np.asarray(A) @ np.asarray(B))

# complex matrix-vector product
u = jnp.asarray([1 + 0j, 2 - 1j, 0 + 1j])
v = mat_vec_mul(1.0 + 0j, A, u)
assert np.allclose(np.asarray(v), np.asarray(A) @ np.asarray(u))

# norms of a complex matrix
an = np.asarray(A)
assert abs(float(mat_norm(A, Norm.ONE))
           - np.abs(an).sum(axis=0).max()) < 1e-14
assert abs(float(mat_norm(A, Norm.INF))
           - np.abs(an).sum(axis=1).max()) < 1e-14
assert abs(float(mat_norm(A, Norm.FRO))
           - np.linalg.norm(an, "fro")) < 1e-14

print("C[0] =", np.asarray(C)[0])
print("complex matrix ops OK")
