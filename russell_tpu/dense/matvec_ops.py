"""Matrix-vector (BLAS L2-class) operations.

Reference: russell_lab/src/matvec/ (mat_vec_mul=dgemv, vec_mat_mul,
vec_outer=dger, mat_sum_rows/cols, solve_lin_sys=dgesv + complex twins).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "mat_vec_mul", "vec_mat_mul", "vec_outer", "vec_outer_update",
    "mat_vec_mul_update", "mat_sum_rows", "mat_sum_cols", "solve_lin_sys",
]


def mat_vec_mul(alpha, a, u):
    """v = alpha * A @ u (matvec/mat_vec_mul.rs, dgemv)."""
    return alpha * jnp.asarray(a) @ jnp.asarray(u)


def mat_vec_mul_update(alpha, a, u, beta, v):
    """v = alpha*A@u + beta*v (matvec/mat_vec_mul_update.rs)."""
    return alpha * jnp.asarray(a) @ jnp.asarray(u) + beta * jnp.asarray(v)


def vec_mat_mul(alpha, u, a):
    """v = alpha * u^T A (matvec/vec_mat_mul.rs)."""
    return alpha * jnp.asarray(u) @ jnp.asarray(a)


def vec_outer(alpha, u, v):
    """A = alpha * u v^T (matvec/vec_outer.rs, dger)."""
    return alpha * jnp.outer(jnp.asarray(u), jnp.asarray(v))


def vec_outer_update(alpha, u, v, a):
    """A += alpha * u v^T (matvec/vec_outer_update.rs)."""
    return jnp.asarray(a) + alpha * jnp.outer(jnp.asarray(u), jnp.asarray(v))


def mat_sum_rows(a):
    """Vector of column sums: sum over rows (matvec/mat_sum_rows.rs)."""
    return jnp.sum(jnp.asarray(a), axis=0)


def mat_sum_cols(a):
    """Vector of row sums: sum over columns (matvec/mat_sum_cols.rs)."""
    return jnp.sum(jnp.asarray(a), axis=1)


def solve_lin_sys(a, b):
    """x = A^{-1} b dense with partial pivoting (matvec/solve_lin_sys.rs,
    dgesv/zgesv). Jittable; supports complex dtypes."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError("matrix must be square")
    if b.shape[0] != a.shape[0]:
        raise ValueError("rhs vector is incompatible")
    return jnp.linalg.solve(a, b)
