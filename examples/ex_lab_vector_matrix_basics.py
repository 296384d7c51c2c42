"""Vector/matrix basics: norms, axpy, inner/outer, matvec, dense solve
(mirrors russell_lab examples/vector_*.rs, matrix_vector_multiplication.rs,
matvec_solve_linear_system.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.core import Norm
from russell_tpu.dense import (
    vec_add, vec_inner, vec_norm, vec_outer, mat_vec_mul, solve_lin_sys,
)

u = np.array([1.0, 2.0, 3.0])
v = np.array([4.0, 5.0, 6.0])
w = vec_add(1.0, u, 2.0, v)              # w = u + 2 v  (axpy-style)
print("u + 2v      =", np.asarray(w))
assert np.allclose(np.asarray(w), [9.0, 12.0, 15.0])

print("inner(u,v)  =", float(vec_inner(u, v)))
assert abs(float(vec_inner(u, v)) - 32.0) < 1e-15

print("|u|_2       =", float(vec_norm(u, Norm.EUC)))
assert abs(float(vec_norm(u, Norm.EUC)) - np.sqrt(14.0)) < 1e-14

outer = vec_outer(1.0, u, v)
print("outer[0]    =", np.asarray(outer)[0])
assert np.allclose(np.asarray(outer), np.outer(u, v))

a = np.array([[1.0, 2.0, 3.0], [0.0, 1.0, 4.0], [5.0, 6.0, 0.0]])
print("A u         =", np.asarray(mat_vec_mul(1.0, a, u)))
assert np.allclose(np.asarray(mat_vec_mul(1.0, a, u)), a @ u)

b = np.array([14.0, 14.0, 17.0])
x = solve_lin_sys(a, b)
print("solve(A,b)  =", np.round(np.asarray(x), 12))
assert np.allclose(a @ np.asarray(x), b, atol=1e-12)
print("ok")
