"""Forward and backward Euler steppers.

Reference behavior: russell_ode/src/euler_forward.rs (explicit, didactic)
and euler_backward.rs (full Newton with the sparse linear solver on
K = h·J − I). TPU-first: the Newton iteration body (rhs eval, Jacobian
values, K assembly, factorize, solve, update, scaled-RMS norm) is a jitted
kernel on the frozen K structure; the convergence loop runs on the host so
the iteration counters match the reference contract.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from russell_tpu.sparse import factor as _factor
from russell_tpu.sparse.enums import Genie

__all__ = ["EulerForward", "EulerBackward"]


class EulerForward:
    """euler_forward.rs: w = y + h f(x, y)."""

    def __init__(self, system):
        self.system = system
        self._f = jax.jit(system.function)
        self.w = None

    def enable_dense_output(self):
        raise ValueError("dense output is not available for the FwEuler method")

    def step(self, work, x, y, h, args):
        work.stats.n_function += 1
        k = self._f(x, y, args)
        self.w = y + h * k

    def accept(self, work, x, y, h, args):
        return x + h, self.w

    def reject(self, work, h):
        pass

    def dense_output(self, x_out, x, y, h):
        raise ValueError("dense output is not available for the FwEuler method")

    def update_params(self, params):
        pass


class EulerBackward:
    """euler_backward.rs: full Newton on r = y_new - y - h f(x_new, y_new)."""

    def __init__(self, params, system):
        self.params = params
        self.system = system
        self._f = jax.jit(system.function)
        self.w = None
        use_num = params.newton.use_numerical_jacobian
        (self._jac_ii, self._jac_jj), self._jac_fn = system.jac_values_fn(use_num)
        self._numerical = use_num or system.jacobian is None
        n = system.ndim
        # K = h J - I structure: jacobian entries + diagonal
        ii = np.concatenate([self._jac_ii, np.arange(n)])
        jj = np.concatenate([self._jac_jj, np.arange(n)])
        lsp = params.newton.lin_sol_params
        self.plan = _factor.analyze(
            n, ii, jj, genie=params.newton.genie,
            grid=getattr(system, "grid", None),
            **({} if lsp is None else dict(
                ordering=lsp.ordering, scaling=lsp.scaling,
                pivot_epsilon=lsp.pivot_epsilon,
                refine_steps=lsp.refinement_nstep,
                dense_threshold=lsp.dense_threshold,
                max_block=lsp.max_block)))
        if self.plan.mixed32:
            # Newton self-corrects: single-pass TPU matmuls suffice
            # (see the same override in radau5.py)
            self.plan.matmul_precision = "default"
            self.plan.solve_matmul_precision = "default"
        plan = self.plan
        jac_fn = self._jac_fn
        f = system.function
        abs_tol, rel_tol = params.tol.abs, params.tol.rel

        def residual(x_new, y_new, y, h, args):
            k = f(x_new, y_new, args)
            r = y_new - y - h * k
            den = abs_tol + rel_tol * jnp.abs(y)
            r_norm = jnp.sqrt(jnp.sum((r / den) ** 2) / y.shape[0])
            return r, r_norm

        def factorize(x_new, y_new, h, args):
            jv = jac_fn(x_new, y_new, args)
            data = jnp.concatenate(
                [h * jv, -jnp.ones(system.ndim, dtype=jv.dtype)])
            return _factor.numeric_factorize(plan, data)

        def solve(fac, r):
            return _factor.factor_solve(plan, fac, r)

        self._residual = jax.jit(residual)
        self._factorize = jax.jit(factorize)
        self._solve = jax.jit(solve)
        self._fac = None

    def enable_dense_output(self):
        raise ValueError("dense output is not available for the BwEuler method")

    def step(self, work, x, y, h, args):
        traditional = not self.params.bweuler.use_modified_newton
        ndim = self.system.ndim
        x_new = x + h
        y_new = y
        success = False
        work.stats.n_iterations = 0
        for _ in range(self.params.newton.n_iteration_max):
            work.stats.n_iterations += 1
            work.stats.n_function += 1
            r, r_norm = self._residual(x_new, y_new, y, h, args)
            if float(r_norm) < self.params.tol.newton:
                success = True
                break
            if traditional or work.stats.n_accepted == 0:
                work.stats.sw_jacobian.reset()
                work.stats.n_jacobian += 1
                if self._numerical:
                    work.stats.n_function += ndim
                work.stats.stop_sw_jacobian()
                work.stats.sw_factor.reset()
                work.stats.n_factor += 1
                self._fac = self._factorize(x_new, y_new, h, args)
                work.stats.stop_sw_factor()
            work.stats.sw_lin_sol.reset()
            work.stats.n_lin_sol += 1
            dy = self._solve(self._fac, r)
            work.stats.stop_sw_lin_sol()
            y_new = y_new + dy
        work.stats.update_n_iterations_max()
        if not success:
            raise RuntimeError(
                "Newton-Raphson method did not complete successfully")
        self.w = y_new

    def accept(self, work, x, y, h, args):
        return x + h, self.w

    def reject(self, work, h):
        pass

    def dense_output(self, x_out, x, y, h):
        raise ValueError("dense output is not available for the BwEuler method")

    def update_params(self, params):
        self.params = params
