"""Explicit Runge-Kutta steppers (all 11 ERK tableaux of the reference).

Reference behavior: russell_ode/src/explicit_runge_kutta.rs. TPU-first
design: all stage evaluations, the update w, the embedded error norm, and
the stiffness-ratio quantities are fused into ONE jitted kernel per method
(the tableau loop unrolls at trace time into a single XLA computation);
the controller (Lund-stabilized stepsize update, dopri5.f lines 463-467)
runs on the host in f64, preserving the reference's exact accept/reject
counters.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from russell_tpu.ode import constants as C
from russell_tpu.ode.enums import Method
from russell_tpu.ode.erk_dense_out import ErkDenseOut
from russell_tpu.ode.detect_stiffness import detect_stiffness

__all__ = ["ExplicitRungeKutta"]


class ExplicitRungeKutta:
    """One stepper for every explicit RK tableau (explicit_runge_kutta.rs:23)."""

    def __init__(self, params, system):
        method = params.method
        info = method.information()
        if info.implicit or not info.multiple_stages:
            raise ValueError(f"cannot use {method} with ExplicitRungeKutta")
        self.params = params
        self.system = system
        self.info = info
        self.A, self.B, self.Cc, self.E = C.tableau(method)
        self.nstage = len(self.B)
        self.lund_factor = (1.0 / (info.order_of_estimator + 1)
                            - params.erk.lund_beta * params.erk.lund_m)
        self.d_min = 1.0 / params.step.m_min
        self.d_max = 1.0 / params.step.m_max
        self.k = None          # (nstage, ndim) stage derivatives (device)
        self.w = None          # updated y (device)
        self.v_stiff = None    # stage vectors needed for stiffness detection
        self.dense_out = None
        self._f = jax.jit(system.function)
        self._kernel = jax.jit(self._build_kernel())

    # -- kernel ---------------------------------------------------------------

    def _build_kernel(self):
        f = self.system.function
        A, B, Cc = self.A, self.B, self.Cc
        E = self.E
        nstage = self.nstage
        method = self.params.method
        abs_tol, rel_tol = self.params.tol.abs, self.params.tol.rel
        embedded = self.info.embedded

        def kernel(x, y, h, k0, args):
            ks = [k0]
            vs = [y]
            for i in range(1, nstage):
                vi = y
                for j in range(i):
                    a = A[i, j]
                    if a != 0.0:
                        vi = vi + (h * a) * ks[j]
                ui = x + h * Cc[i]
                ks.append(f(ui, vi, args))
                vs.append(vi)
            w = y
            for i in range(nstage):
                if B[i] != 0.0:
                    w = w + (B[i] * h) * ks[i]

            kmat = jnp.stack(ks)
            dim = float(self.system.ndim)

            if not embedded:
                zero = jnp.zeros((), dtype=y.dtype)
                return kmat, w, zero, zero, zero

            sk = abs_tol + rel_tol * jnp.maximum(jnp.abs(y), jnp.abs(w))
            if method == Method.DOPRI8:
                # 8(5,3) double error estimate (dop853.f; HW-I Eq. 10.17)
                err_a = jnp.zeros_like(y)
                err_b = jnp.zeros_like(y)
                for i in range(nstage):
                    if B[i] != 0.0:
                        err_a = err_a + B[i] * ks[i]
                    if E[i] != 0.0:
                        err_b = err_b + E[i] * ks[i]
                err_a = (err_a - C.DOPRI8_BHH1 * ks[0] - C.DOPRI8_BHH2 * ks[8]
                         - C.DOPRI8_BHH3 * ks[11])
                err_3 = jnp.sum((err_a / sk) ** 2)
                err_5 = jnp.sum((err_b / sk) ** 2)
                den = err_5 + 0.01 * err_3
                den = jnp.where(den <= 0.0, 1.0, den)
                rel_error = jnp.abs(h) * err_5 * jnp.sqrt(1.0 / (dim * den))
            else:
                err_m = jnp.zeros_like(y)
                for i in range(nstage):
                    if E[i] != 0.0:
                        err_m = err_m + (E[i] * h) * ks[i]
                ratio = err_m / sk
                rel_error = jnp.maximum(
                    jnp.sqrt(jnp.sum(ratio * ratio) / dim), 1.0e-10)

            # stiffness-ratio quantities (HW-II Eq. 2.26, page 22)
            if method == Method.DOPRI5:
                num = jnp.sum((ks[6] - ks[5]) ** 2)
                den2 = jnp.sum((vs[6] - vs[5]) ** 2)
            elif method == Method.DOPRI8:
                num = jnp.zeros(())
                den2 = jnp.sum((w - vs[11]) ** 2)  # num needs f(x+h, w): accept
            else:
                num = jnp.zeros(())
                den2 = jnp.zeros(())
            return kmat, w, rel_error, num, den2

        return kernel

    # -- OdeSolverTrait surface ----------------------------------------------

    def enable_dense_output(self):
        self.dense_out = ErkDenseOut(self.params.method, self.system.ndim,
                                     self.system)

    def step(self, work, x, y, h, args):
        if ((work.stats.n_accepted == 0 or not self.info.first_step_same_as_last)
                and not work.follows_reject_step) or self.k is None:
            work.stats.n_function += 1
            k0 = self._f(x, y, args)
        else:
            k0 = self.k[0]
        work.stats.n_function += self.nstage - 1
        kmat, w, rel_error, num, den = self._kernel(x, y, h, k0, args)
        self.k = kmat
        self.w = w
        self._stiff_num = num
        self._stiff_den = den
        if self.info.embedded:
            work.rel_error = float(rel_error)

    def accept(self, work, x, y, h, args):
        """Returns (x_new, y_new); updates work counters/stepsize."""
        if self.dense_out is not None:
            work.stats.n_function += self.dense_out.update(
                x, y, h, self.w, self.k, args)
        x_new = x + h
        y_new = self.w
        if self.info.first_step_same_as_last:
            self.k = self.k.at[0].set(self.k[self.nstage - 1])
        if not self.info.embedded:
            return x_new, y_new

        # stepsize estimate (dopri5.f lines 463-467)
        fac = work.rel_error ** self.lund_factor
        if self.params.erk.lund_beta > 0.0 and work.rel_error_prev > 0.0:
            fac = fac / work.rel_error_prev ** self.params.erk.lund_beta
        fac = max(self.d_max, min(self.d_min, fac / self.params.step.m_safety))
        work.h_new = h / fac

        # stiffness detection
        if self.params.stiffness.enabled:
            if self.params.method == Method.DOPRI5:
                num, den = float(self._stiff_num), float(self._stiff_den)
                if den > np.finfo(float).eps:
                    work.stiff_h_times_rho = h * math.sqrt(num / den)
                detect_stiffness(work, x_new - h, self.params)
            elif self.params.method == Method.DOPRI8:
                work.stats.n_function += 1
                k_new = self._f(x_new, y_new, args)
                num = float(jnp.sum((k_new - self.k[11]) ** 2))
                den = float(self._stiff_den)
                if den > np.finfo(float).eps:
                    work.stiff_h_times_rho = h * math.sqrt(num / den)
                detect_stiffness(work, x_new - h, self.params)
        return x_new, y_new

    def reject(self, work, h):
        d = work.rel_error ** self.lund_factor / self.params.step.m_safety
        work.h_new = h / min(self.d_min, d)

    def dense_output(self, x_out, x, y, h):
        if self.dense_out is None:
            raise RuntimeError("dense output was not enabled")
        return self.dense_out.calculate(x_out, x, h)

    def update_params(self, params):
        self.params = params
