"""Dense Newton-Raphson solver for F(u) = 0.

Reference contract: russell_lab/src/algo/newton_solver.rs:22 — scaled
residual convergence, optional analytical Jacobian (autodiff by default
here — the idiomatic JAX replacement), numerical Jacobian fallback,
Stats counters.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from russell_tpu.algo.stats import Stats

__all__ = ["NewtonSolver", "num_jacobian"]


def num_jacobian(f, x, u, args=None):
    """Dense Jacobian by central differences
    (russell_lab/src/algo/num_jacobian.rs:80)."""
    u = np.asarray(u, dtype=np.float64)
    ndim = len(u)
    f0 = np.asarray(f(x, u, args))
    jac = np.zeros((ndim, ndim))
    for j in range(ndim):
        step = max(1e-6, 1e-6 * abs(u[j]))
        up = u.copy()
        up[j] += step
        um = u.copy()
        um[j] -= step
        jac[:, j] = (np.asarray(f(x, up, args))
                     - np.asarray(f(x, um, args))) / (2.0 * step)
    return jac


class NewtonSolver:
    """(newton_solver.rs:22)."""

    def __init__(self, ndim: int):
        if ndim < 1:
            raise ValueError("ndim must be >= 1")
        self.ndim = ndim
        self.n_iteration_max = 20
        self.tol_abs = 1e-10
        self.tol_rel = 1e-10
        self.use_numerical_jacobian = False
        self.stats = Stats()

    def set_enable_stats(self, value: bool):
        self.stats.enabled = value
        return self

    def get_stats(self) -> Stats:
        if not self.stats.enabled:
            raise RuntimeError("statistics tracking is disabled")
        return self.stats

    def solve(self, u0, f: Callable, jac: Optional[Callable] = None,
              args=None, x: float = 0.0):
        """Newton iteration: J du = -F; u += du. ``f(x, u, args) -> F``;
        ``jac(x, u, args) -> J`` (defaults to jax.jacfwd of f)."""
        self.stats.reset()
        u = jnp.asarray(u0, dtype=jnp.result_type(float))
        if jac is None and not self.use_numerical_jacobian:
            jac = lambda xx, uu, aa: jax.jacfwd(
                lambda v: jnp.asarray(f(xx, v, aa)))(uu)
        for _ in range(self.n_iteration_max):
            self.stats.n_iterations += 1
            r = jnp.asarray(f(x, u, args))
            self.stats.n_function += 1
            norm = float(jnp.sqrt(jnp.sum(
                (r / (self.tol_abs + self.tol_rel * jnp.abs(u))) ** 2)
                / self.ndim))
            if norm < 1.0:
                self.stats.error_estimate = norm
                self.stats.stop_sw()
                return u
            self.stats.n_jacobian += 1
            if self.use_numerical_jacobian:
                J = jnp.asarray(num_jacobian(f, x, np.asarray(u), args))
                self.stats.n_function += 2 * self.ndim
            else:
                J = jnp.asarray(jac(x, u, args))
            du = jnp.linalg.solve(J, -r)
            u = u + du
        raise RuntimeError("Newton-Raphson method did not converge")
