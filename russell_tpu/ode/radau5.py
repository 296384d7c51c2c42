"""Radau IIA order 5 (implicit, embedded) for ODEs and DAEs.

Reference behavior: russell_ode/src/radau5.rs (itself a line-faithful
restatement of Hairer-Wanner's radau5.f); constants from radau5.f.

TPU-first redesign:
- The two Newton coefficient matrices K_real = γM − J (n×n real) and
  K_comp = (α+βι)M − J (n×n complex) share one frozen sparsity structure
  (Jacobian entries + mass entries); both numeric factorizations are
  emitted in a single jitted computation, so XLA runs them concurrently —
  replacing the reference's 2-thread ``std::thread::scope`` trick
  (radau5.rs:270-296, P5 in SURVEY.md §2.9).
- Each simplified-Newton iteration (3 rhs evaluations, TI transform,
  real+complex triangular solves, w/z update, scaled RMS norm) is one
  fused kernel; the convergence/divergence control (θ, η — radau5.f lines
  914-967) runs on the host in f64 so statistics counters match the
  Fortran oracles exactly.
- Collocation dense output and the Gustafsson predictive controller
  (radau5.rs:589) follow the reference formulas.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from russell_tpu.ode.constants import radau5_constants
from russell_tpu.sparse import factor as _factor
from russell_tpu.sparse.enums import Genie

__all__ = ["Radau5"]

EPS = 2.220446049250313e-16
_R5 = radau5_constants()


class Radau5:
    def __init__(self, params, system):
        self.params = params
        self.system = system
        ndim = system.ndim
        use_num = params.newton.use_numerical_jacobian
        (jac_ii, jac_jj), self._jac_fn = system.jac_values_fn(use_num)
        self._numerical = use_num or system.jacobian is None

        # mass structure/values (diagonal identity when no mass; radau5.rs:131)
        if system.mass is not None:
            m_ii, m_jj, m_vv = system.mass.triplets()
            self._has_mass = True
        else:
            m_ii = m_jj = np.arange(ndim)
            m_vv = np.ones(ndim)
            self._has_mass = False
        self._mass_ii = np.asarray(m_ii, dtype=np.int64)
        self._mass_jj = np.asarray(m_jj, dtype=np.int64)
        self._mass_vv = np.asarray(m_vv, dtype=np.float64)

        # shared K structure = [jac entries][mass entries]
        ii = np.concatenate([jac_ii, self._mass_ii])
        jj = np.concatenate([jac_jj, self._mass_jj])
        lsp = params.newton.lin_sol_params
        kw = {} if lsp is None else dict(
            ordering=lsp.ordering, scaling=lsp.scaling,
            pivot_epsilon=lsp.pivot_epsilon,
            refine_steps=lsp.refinement_nstep,
            dense_threshold=lsp.dense_threshold, max_block=lsp.max_block)
        self.plan = _factor.analyze(ndim, ii, jj, genie=params.newton.genie,
                                    grid=getattr(system, "grid", None), **kw)
        # the Newton loop passes explicit refine_steps with f64
        # residuals, which tolerates single-pass (bf16) TPU matmuls in
        # the factor/substitution kernels — measured identical step/
        # factorization counters and ~2% faster end-to-end than the
        # full-f32 six-pass mode the standalone LinSolver defaults to
        # (accuracy there is contractual; here Newton self-corrects)
        if self.plan.mixed32:
            self.plan.matmul_precision = "default"
            self.plan.solve_matmul_precision = "default"

        self._f = jax.jit(system.function)
        self._build_kernels()

        # state
        self.scaling = None
        self.k_accepted = None
        self.z = None          # (3, ndim)
        self.w = None          # (3, ndim)
        self.yc = None         # (3, ndim) collocation values
        self.fac_real = None
        self.fac_comp = None
        self.reuse_jacobian = False
        self.reuse_jacobian_kk_and_fact = False
        self.jacobian_computed = False
        self._jv = None
        self.eta = 1.0
        self.theta = params.radau5.theta_max

    # -- kernels --------------------------------------------------------------

    def _build_kernels(self):
        plan = self.plan
        f = self.system.function
        ndim = self.system.ndim
        mass_vv = jnp.asarray(self._mass_vv)
        mass_ii = jnp.asarray(self._mass_ii)
        mass_jj = jnp.asarray(self._mass_jj)
        has_mass = self._has_mass
        A, B, G = _R5["ALPHA"], _R5["BETA"], _R5["GAMMA"]
        T, TI, C = _R5["T"], _R5["TI"], _R5["C"]
        E0, E1, E2 = _R5["E0"], _R5["E1"], _R5["E2"]
        abs_tol, rel_tol = self.params.tol.abs, self.params.tol.rel

        def mass_mat_vec(w):
            return jax.ops.segment_sum(mass_vv * w[mass_jj], mass_ii,
                                       num_segments=ndim)

        mixed = plan.mixed32
        # Newton corrections tolerate inexact solves: one refinement round
        # (vs the solver-API default) halves the substitution passes
        _nr = 1 if mixed else 0

        def factorize(jv, h):
            alpha, beta, gamma = A / h, B / h, G / h
            cdtype = (jnp.complex64 if (mixed or jv.dtype != jnp.float64)
                      else jnp.complex128)
            data_r = jnp.concatenate([-jv, gamma * mass_vv])
            data_c = jnp.concatenate([
                -jv.astype(cdtype),
                (alpha + 1j * beta) * mass_vv.astype(cdtype)])
            # both factorizations share one device pass for SPLU (P5)
            fac_r, fac_c = _factor.numeric_factorize_pair(plan, data_r,
                                                          data_c)
            return fac_r, fac_c

        def newton_iter(x, y, h, w, z, fac_r, fac_c, scaling, args):
            alpha, beta, gamma = A / h, B / h, G / h
            u = x + C * h
            v0, v1, v2 = y + z[0], y + z[1], y + z[2]
            k0 = f(u[0], v0, args)
            k1 = f(u[1], v1, args)
            k2 = f(u[2], v2, args)
            if has_mass:
                l0, l1, l2 = (mass_mat_vec(w[0]), mass_mat_vec(w[1]),
                              mass_mat_vec(w[2]))
            else:
                l0, l1, l2 = w[0], w[1], w[2]
            r0 = TI[0, 0] * k0 + TI[0, 1] * k1 + TI[0, 2] * k2 - gamma * l0
            r1 = (TI[1, 0] * k0 + TI[1, 1] * k1 + TI[1, 2] * k2
                  - alpha * l1 + beta * l2)
            r2 = (TI[2, 0] * k0 + TI[2, 1] * k1 + TI[2, 2] * k2
                  - beta * l1 - alpha * l2)
            if mixed:
                rc = (r1.astype(jnp.float32)
                      + 1j * r2.astype(jnp.float32))
            else:
                rc = r1 + 1j * r2
            # real + complex solves share one substitution pass for SPLU
            dw0, dw12 = _factor.factor_solve_pair(plan, fac_r, fac_c,
                                                  r0, rc,
                                                  refine_steps=_nr)
            w0 = w[0] + dw0
            w1 = w[1] + jnp.real(dw12)
            w2 = w[2] + jnp.imag(dw12)
            wn = jnp.stack([w0, w1, w2])
            zn = jnp.stack([
                T[0, 0] * w0 + T[0, 1] * w1 + T[0, 2] * w2,
                T[1, 0] * w0 + T[1, 1] * w1 + T[1, 2] * w2,
                T[2, 0] * w0 + T[2, 1] * w1 + T[2, 2] * w2])
            ldw = jnp.sqrt((jnp.sum((dw0 / scaling) ** 2)
                            + jnp.sum((jnp.real(dw12) / scaling) ** 2)
                            + jnp.sum((jnp.imag(dw12) / scaling) ** 2))
                           / (3.0 * ndim))
            return wn, zn, ldw

        def trial(h, h_prev, yc):
            c3q = h / h_prev
            c1q = _R5["MU1"] * c3q
            c2q = _R5["MU2"] * c3q
            MU3, MU4 = _R5["MU3"], _R5["MU4"]

            def poly(cq):
                return cq * (yc[0] + (cq - MU4) * (yc[1] + (cq - MU3) * yc[2]))

            z = jnp.stack([poly(c1q), poly(c2q), poly(c3q)])
            w = jnp.stack([
                TI[0, 0] * z[0] + TI[0, 1] * z[1] + TI[0, 2] * z[2],
                TI[1, 0] * z[0] + TI[1, 1] * z[1] + TI[1, 2] * z[2],
                TI[2, 0] * z[0] + TI[2, 1] * z[1] + TI[2, 2] * z[2]])
            return z, w

        def err_estimate(z, k_acc, h, fac_r, scaling):
            gamma = G / h
            ez = E0 * z[0] + E1 * z[1] + E2 * z[2]
            if has_mass:
                mez = gamma * mass_mat_vec(ez)
            else:
                mez = gamma * ez
            rhs = mez + k_acc
            err = _factor.factor_solve(plan, fac_r, rhs,
                                       refine_steps=_nr)
            rel = jnp.maximum(
                1e-10, jnp.sqrt(jnp.sum((err / scaling) ** 2) / ndim))
            return err, mez, rel

        def err_estimate2(mez, fpe, fac_r, scaling):
            rhs = mez + fpe
            err = _factor.factor_solve(plan, fac_r, rhs,
                                       refine_steps=_nr)
            return jnp.maximum(
                1e-10, jnp.sqrt(jnp.sum((err / scaling) ** 2) / ndim))

        def collocation(y, z):
            MU1, MU2, MU3, MU5 = (_R5["MU1"], _R5["MU2"], _R5["MU3"],
                                  _R5["MU5"])
            MU4 = _R5["MU4"]
            yc0 = (z[1] - z[2]) / MU4
            yc1 = ((z[0] - z[1]) / MU5 - yc0) / MU3
            yc2 = yc1 - ((z[0] - z[1]) / MU5 - z[0] / MU1) / MU2
            return y + z[2], jnp.stack([yc0, yc1, yc2])

        self._k_factorize = jax.jit(factorize)
        self._k_newton = jax.jit(newton_iter)
        self._k_trial = jax.jit(trial)
        self._k_err = jax.jit(err_estimate)
        self._k_err2 = jax.jit(err_estimate2)
        self._k_colloc = jax.jit(collocation)

    # -- helpers --------------------------------------------------------------

    def _initialize(self, work, x, y, args):
        """Scaling vector + first function eval (radau5.rs:186)."""
        self.scaling = (self.params.tol.abs
                        + self.params.tol.rel * jnp.abs(y))
        work.stats.n_function += 1
        self.k_accepted = self._f(x, y, args)

    def enable_dense_output(self):
        pass  # collocation polynomial always available

    # -- OdeSolverTrait surface ----------------------------------------------

    def step(self, work, x, y, h, args):
        if work.stats.n_accepted == 0:
            self._initialize(work, x, y, args)
        ndim = self.system.ndim

        # assemble + factorize (simple Newton: frozen within the step)
        if self.reuse_jacobian_kk_and_fact:
            self.reuse_jacobian_kk_and_fact = False
        else:
            if self.reuse_jacobian:
                self.reuse_jacobian = False
            elif not self.jacobian_computed:
                work.stats.sw_jacobian.reset()
                work.stats.n_jacobian += 1
                if self._numerical:
                    work.stats.n_function += ndim
                self._jv = self._jac_fn(x, y, args)
                self.jacobian_computed = True
                work.stats.stop_sw_jacobian()
            # dump-and-die debugging (radau5.rs:242-254)
            nstep = self.params.newton.write_matrix_after_nstep_and_stop
            if nstep is not None and work.stats.n_accepted > nstep:
                self._write_matrices(h)
                raise RuntimeError(
                    "MATRIX FILES GENERATED in /tmp/russell_tpu/")
            work.stats.sw_factor.reset()
            work.stats.n_factor += 1
            self.fac_real, self.fac_comp = self._k_factorize(self._jv, h)
            jax.block_until_ready(self.fac_real["min_pivot"])
            work.stats.stop_sw_factor()

        # trial values (radau5.rs:367-390)
        if work.stats.n_accepted == 0 or self.params.radau5.zero_trial:
            z = jnp.zeros((3, ndim), dtype=jnp.asarray(y).dtype)
            w = jnp.zeros_like(z)
        else:
            z, w = self._k_trial(h, work.h_prev, self.yc)

        # Newton control state (radau5.f lines 914-931)
        self.eta = max(self.eta, EPS) ** 0.8
        self.theta = self.params.radau5.theta_max
        ldw_old = 0.0
        thq_old = 0.0
        nit = self.params.newton.n_iteration_max
        success = False
        work.iterations_diverging = False
        work.stats.n_iterations = 0

        for _ in range(nit):
            work.stats.n_iterations += 1
            work.stats.n_function += 3
            work.stats.sw_lin_sol.reset()
            work.stats.n_lin_sol += 1
            w, z, ldw_dev = self._k_newton(x, y, h, w, z, self.fac_real,
                                           self.fac_comp, self.scaling, args)
            ldw = float(ldw_dev)
            work.stats.stop_sw_lin_sol()

            newt = work.stats.n_iterations
            if newt > 1 and newt < nit:
                thq = ldw / ldw_old
                if newt == 2:
                    self.theta = thq
                else:
                    self.theta = math.sqrt(thq * thq_old)
                thq_old = thq
                if self.theta < 0.99:
                    self.eta = self.theta / (1.0 - self.theta)
                    exp = float(nit - 1 - newt)
                    rel_err = (self.eta * ldw * self.theta ** exp
                               / self.params.tol.newton)
                    if rel_err >= 1.0:  # diverging
                        q_newt = max(1e-4, min(20.0, rel_err))
                        den = float(4 + nit - 1 - newt)
                        work.h_multiplier_diverging = \
                            0.8 * q_newt ** (-1.0 / den)
                        work.iterations_diverging = True
                        self.z, self.w = z, w
                        return
                else:  # diverging badly
                    work.h_multiplier_diverging = 0.5
                    work.iterations_diverging = True
                    self.z, self.w = z, w
                    return
            ldw_old = ldw
            if self.eta * ldw < self.params.tol.newton:
                success = True
                break

        work.stats.update_n_iterations_max()
        if not success:
            raise RuntimeError(
                "Newton-Raphson method did not complete successfully")
        self.z, self.w = z, w

        # error estimate (HW-VII p123 Eq. 8.20; radau5.rs:536-585)
        err, mez, rel = self._k_err(z, self.k_accepted, h, self.fac_real,
                                    self.scaling)
        work.rel_error = float(rel)
        if work.rel_error < 1.0:
            return
        if work.stats.n_accepted == 0 or work.follows_reject_step:
            work.stats.n_function += 1
            fpe = self._f(x, y + err, args)
            work.rel_error = float(self._k_err2(mez, fpe, self.fac_real,
                                                self.scaling))

    def _write_matrices(self, h):
        """Write J, K_real, K_comp MatrixMarket + vismatrix files
        (radau5.rs write_matrix_after_nstep_and_stop)."""
        import os
        from russell_tpu.sparse.coo import CooMatrix
        from russell_tpu.sparse.matrix_market import write_matrix_market
        os.makedirs("/tmp/russell_tpu", exist_ok=True)
        ndim = self.system.ndim
        jv = np.asarray(self._jv)
        jac = CooMatrix.from_arrays(ndim, ndim,
                                    self.plan.rows[: len(jv)],
                                    self.plan.cols[: len(jv)], jv)
        A, B, G = _R5["ALPHA"], _R5["BETA"], _R5["GAMMA"]
        kr = np.concatenate([-jv, (G / h) * self._mass_vv])
        kc = np.concatenate([-jv.astype(np.complex128),
                             ((A + 1j * B) / h) * self._mass_vv])
        rows = np.concatenate([self.plan.rows[: len(jv)], self._mass_ii])
        cols = np.concatenate([self.plan.cols[: len(jv)], self._mass_jj])
        kk_real = CooMatrix.from_arrays(ndim, ndim, rows, cols, kr)
        kk_comp = CooMatrix.from_arrays(ndim, ndim, rows, cols, kc)
        for name, m in (("jacobian", jac), ("kk_real", kk_real),
                        ("kk_comp", kk_comp)):
            write_matrix_market(m, f"/tmp/russell_tpu/{name}.mtx")
            write_matrix_market(m, f"/tmp/russell_tpu/{name}.smat",
                                vismatrix=True)

    def accept(self, work, x, y, h, args):
        self.reuse_jacobian_kk_and_fact = False
        self.reuse_jacobian = False
        self.jacobian_computed = False

        y_new, self.yc = self._k_colloc(y, self.z)

        # stepsize estimate (radau5.f; radau5.rs:609-625)
        newt = work.stats.n_iterations
        nit = self.params.newton.n_iteration_max
        num = self.params.step.m_safety * (1 + 2 * nit)
        den = newt + 2 * nit
        fac = min(self.params.step.m_safety, num / den)
        div = max(self.params.step.m_min,
                  min(self.params.step.m_max, work.rel_error ** 0.25 / fac))
        h_new = h / div

        # Gustafsson predictive controller
        if self.params.radau5.use_pred_control and work.stats.n_accepted > 1:
            r2 = work.rel_error * work.rel_error
            rp = work.rel_error_prev
            fac_g = ((work.h_prev / h) * (r2 / rp) ** 0.25
                     / self.params.step.m_safety)
            fac_g = max(self.params.step.m_min,
                        min(self.params.step.m_max, fac_g))
            div = max(div, fac_g)
            h_new = h / div

        h_ratio = h_new / h
        self.reuse_jacobian_kk_and_fact = (
            self.theta <= self.params.radau5.theta_max
            and h_ratio >= self.params.radau5.c1h
            and h_ratio <= self.params.radau5.c2h)
        if not self.reuse_jacobian_kk_and_fact:
            work.h_new = h_new
            self.reuse_jacobian = self.theta <= self.params.radau5.theta_max

        x_new = x + h
        self._initialize(work, x_new, y_new, args)
        return x_new, y_new

    def reject(self, work, h):
        newt = work.stats.n_iterations
        nit = self.params.newton.n_iteration_max
        num = self.params.step.m_safety * (1 + 2 * nit)
        den = newt + 2 * nit
        fac = min(self.params.step.m_safety, num / den)
        div = max(self.params.step.m_min,
                  min(self.params.step.m_max, work.rel_error ** 0.25 / fac))
        work.h_new = h / div

    def dense_output(self, x_out, x, y, h):
        """Collocation polynomial interpolation (radau5.rs:669)."""
        assert x - h <= x_out <= x
        s = (x_out - x) / h
        MU3, MU4 = _R5["MU3"], _R5["MU4"]
        yc = self.yc
        return (jnp.asarray(y)
                + s * (yc[0] + (s - MU4) * (yc[1] + (s - MU3) * yc[2])))

    def update_params(self, params):
        self.params = params
