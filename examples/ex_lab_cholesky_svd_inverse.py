"""Cholesky, SVD, inverse and pseudo-inverse
(mirrors russell_lab examples/matrix_cholesky_3x3.rs,
matrix_singular_value_decomposition.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.dense import (
    mat_cholesky, mat_svd, mat_inverse, mat_pseudo_inverse,
)

# Cholesky of the reference's 3x3 SPD sample
a = np.array([[4.0, 12.0, -16.0],
              [12.0, 37.0, -43.0],
              [-16.0, -43.0, 98.0]])
L = np.asarray(mat_cholesky(a))
print("L =\n", np.round(L, 12))
assert np.allclose(L @ L.T, a, atol=1e-12)
assert np.allclose(L, np.tril(L))

# SVD of a rectangular matrix
b = np.array([[1.0, 0.0, 0.0, 1.0, 2.0],
              [0.0, 0.0, 3.0, 0.0, 0.0],
              [0.0, 0.0, 0.0, 0.0, 0.0],
              [0.0, 2.0, 0.0, 0.0, 0.0]])
s, u, vt = (np.asarray(m) for m in mat_svd(b))   # (s, u, vt) like dgesvd
print("sigma =", np.round(s, 12))
S = np.zeros_like(b)
S[:len(s), :len(s)] = np.diag(s)
assert np.allclose(u @ S @ vt, b, atol=1e-12)

# inverse + pseudo-inverse
c = np.array([[1.0, 2.0], [3.0, 4.0]])
ci, det = mat_inverse(c)
ci = np.asarray(ci)
assert abs(float(det) - (-2.0)) < 1e-14
assert np.allclose(ci @ c, np.eye(2), atol=1e-12)
bp = np.asarray(mat_pseudo_inverse(b))
assert np.allclose(b @ bp @ b, b, atol=1e-11)
print("inverse and pseudo-inverse verified")
print("ok")
