"""Eigenvalues: general (dgeev analog), symmetric, and generalized
(mirrors russell_lab examples/matrix_eigenvalues.rs,
matrix_eigenvalues_symmetric.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.dense import (
    mat_eigen, mat_eigen_sym, mat_eigen_sym_jacobi, mat_gen_eigen,
)

# general (nonsymmetric): rotation-like matrix with a complex pair
a = np.array([[0.0, 1.0, 0.0],
              [0.0, 0.0, 1.0],
              [1.0, 0.0, 0.0]])
lr, li, vr, vi = (np.asarray(m) for m in mat_eigen(a))
lam = np.sort_complex(lr + 1j * li)
print("eigenvalues:", np.round(lam, 12))
# cube roots of unity
expect = np.sort_complex(np.exp(2j * np.pi * np.arange(3) / 3))
assert np.allclose(lam, expect, atol=1e-12)

# symmetric: eigh vs the dual-implementation Jacobi rotation check
s = np.array([[2.0, 0.0, 0.0], [0.0, 3.0, 4.0], [0.0, 4.0, 9.0]])
w, v = (np.asarray(m) for m in mat_eigen_sym(s))
wj, vj = (np.asarray(m) for m in mat_eigen_sym_jacobi(s))
print("sym eigenvalues:", np.sort(w))
assert np.allclose(np.sort(w), [1.0, 2.0, 11.0], atol=1e-12)
assert np.allclose(np.sort(w), np.sort(wj), atol=1e-10)

# generalized A v = lambda B v
A = np.diag([2.0, 6.0, 12.0])
B = np.diag([1.0, 2.0, 3.0])
glr, gli, _, _ = (np.asarray(m) for m in mat_gen_eigen(A, B))
print("generalized:", np.sort(glr))
assert np.allclose(np.sort(glr), [2.0, 3.0, 4.0], atol=1e-12)
print("ok")
