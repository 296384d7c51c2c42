"""Sparse numerical Jacobian (reference: russell_sparse/src/numerical_jacobian.rs:129).

The reference fills a fixed-sparsity COO with first-order forward differences,
scaled by alpha, for use by ODE/nonlin solvers lacking an analytical Jacobian.

TPU-native twist: instead of ndim sequential forward differences, we expose
two implementations:

- ``numerical_jacobian``: host-convention API writing alpha*J values for a
  fixed (rows, cols) structure using forward differences — jittable via vmap
  over perturbed evaluations (ndim+1 function calls batched on device).
- When the rhs is a traced JAX function, prefer ``jax.jacfwd`` through
  ``jacobian_values`` — exact derivatives at the same cost profile.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["numerical_jacobian", "jacobian_values"]


def numerical_jacobian(alpha, x, y, f, rows, cols, args=None):
    """alpha * J[rows, cols] by forward differences (vmapped on device).

    ``f(x, y, args) -> dydx`` must be a traceable JAX function.
    Matches numerical_jacobian.rs:129 semantics (forward differences with
    relative step) but evaluates all columns as one batched computation.
    """
    y = jnp.asarray(y)
    ndim = y.shape[0]
    eps = jnp.sqrt(jnp.finfo(y.dtype).eps)
    f0 = f(x, y, args)
    steps = eps * jnp.maximum(jnp.abs(y), 1.0)

    def col(j):
        yj = y.at[j].add(steps[j])
        return (f(x, yj, args) - f0) / steps[j]

    jt = jax.vmap(col)(jnp.arange(ndim))  # jt[j, i] = dF_i/dy_j
    rows = jnp.asarray(np.asarray(rows, dtype=np.int32))
    cols = jnp.asarray(np.asarray(cols, dtype=np.int32))
    return alpha * jt[cols, rows]


def jacobian_values(alpha, x, y, f, rows, cols, args=None):
    """Exact alpha * J[rows, cols] via forward-mode AD (jacfwd)."""
    jac = jax.jacfwd(lambda yy: f(x, yy, args))(jnp.asarray(y))
    rows = jnp.asarray(np.asarray(rows, dtype=np.int32))
    cols = jnp.asarray(np.asarray(cols, dtype=np.int32))
    return alpha * jac[rows, cols]
