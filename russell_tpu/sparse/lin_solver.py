"""Unified sparse linear solver: params, stats, and the LinSolTrait contract.

Reference contract: russell_sparse/src/lin_solver.rs:12-105 —

- ``factorize(matrix, params)`` may be called repeatedly, but the structure
  (nrow/ncol/nnz/sym and positions) must not change between calls
  (lin_solver.rs:17-28). That contract is exactly jit shape-stability: the
  first factorize runs the host symbolic phase and compiles the numeric
  phase; subsequent calls are pure device execution.
- ``solve(x, mat, rhs)`` requires a prior ``factorize``.
- ``LinSolver(genie)`` dispatches to a kernel path (lin_solver.rs:105); our
  Genie values name native TPU paths instead of external backends.
- Stats mirror StatsLinSol (stats_lin_sol.rs:105) including the
  (mantissa, base, exponent) determinant of MUMPS ICNTL(33)/UMFPACK.

Complex systems work through the same class (dtype-dispatch), covering the
reference's ComplexLinSolver (complex_lin_solver.rs).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field, asdict
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from russell_tpu.core.stopwatch import format_nanoseconds
from russell_tpu.sparse.enums import Genie, Ordering, Scaling, Sym
from russell_tpu.sparse import factor as _factor
from russell_tpu.sparse.coo import CooMatrix
from russell_tpu.sparse.csr import CsrMatrix

__all__ = ["LinSolParams", "StatsLinSol", "LinSolver"]


@dataclass
class LinSolParams:
    """Solver options (reference: lin_sol_params.rs:5-70)."""

    ordering: Ordering = Ordering.AUTO
    scaling: Scaling = Scaling.AUTO
    pivot_epsilon: float = 1e-14
    refinement_nstep: int = 2
    positive_definite: bool = False
    compute_determinant: bool = False
    compute_error_estimates: bool = False
    verbose: bool = False
    # native-path tuning
    dense_threshold: int = 1200
    max_block: int = 4096


@dataclass
class StatsLinSol:
    """Benchmark/stats record (reference: stats_lin_sol.rs:105)."""

    main: dict = field(default_factory=lambda: {
        "platform": "russell_tpu", "blas_lib": "XLA", "solver": ""})
    matrix: dict = field(default_factory=lambda: {
        "name": "", "nrow": 0, "ncol": 0, "nnz": 0, "complx": False,
        "symmetric": "No"})
    requests: dict = field(default_factory=lambda: {
        "ordering": "Auto", "scaling": "Auto"})
    output: dict = field(default_factory=lambda: {
        "effective_ordering": "", "effective_scaling": "",
        "min_pivot": 0.0, "n_perturbed_pivots": 0})
    determinant: dict = field(default_factory=lambda: {
        "mantissa_real": 0.0, "mantissa_imag": 0.0, "base": 10.0,
        "exponent": 0.0})
    verify: dict = field(default_factory=dict)
    time_nanoseconds: dict = field(default_factory=lambda: {
        "initialize": 0, "factorize": 0, "solve": 0})

    @property
    def time_human(self) -> dict:
        return {k: format_nanoseconds(v) for k, v in self.time_nanoseconds.items()}

    def get_json(self) -> str:
        d = asdict(self)
        d["time_human"] = self.time_human
        return json.dumps(d, indent=2)


def _expand_full_pattern(rows, cols, coo_order_vals, sym: Sym):
    """Mirror triangular symmetric storage into the full pattern.

    Returns (rows_full, cols_full, mirror_map) where value arrays in COO
    order extend to full order via vals_full = concat(vals, vals[mirror_map]).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    if sym.triangular():
        off = np.nonzero(rows != cols)[0]
        rows_full = np.concatenate([rows, cols[off]])
        cols_full = np.concatenate([cols, rows[off]])
        return rows_full, cols_full, off
    return rows, cols, None


class LinSolver:
    """Native sparse direct solver with the LinSolTrait contract."""

    def __init__(self, genie: Genie | str = Genie.AUTO):
        if isinstance(genie, str):
            genie = Genie.from_name(genie)
        self.genie = genie
        self.plan: Optional[_factor.SolvePlan] = None
        self.fac = None
        self._structure = None
        self._mirror = None
        self._fact_fn = None
        self._solve_fn = None
        self.stats = StatsLinSol()
        self._factorized = False

    # -- factorize -----------------------------------------------------------

    def factorize(self, mat, params: Optional[LinSolParams] = None):
        """Factorize a CooMatrix or CsrMatrix (square).

        First call runs the host symbolic phase and compiles the numeric
        phase; later calls require the *same* structure (lin_solver.rs:17-28)
        and only re-run the jitted numeric factorization.
        """
        params = params or LinSolParams()
        t0 = time.perf_counter_ns()
        if isinstance(mat, CooMatrix):
            ii, jj, vv = mat.triplets()
            nrow, ncol, sym = mat.nrow, mat.ncol, mat.sym
        elif isinstance(mat, CsrMatrix):
            ii, jj = mat.row_ids, mat.indices
            vv = mat.data
            nrow, ncol, sym = mat.nrow, mat.ncol, mat.sym
        else:
            raise TypeError("matrix must be CooMatrix or CsrMatrix")
        if nrow != ncol:
            raise ValueError("the matrix must be square")
        structure = (nrow, ii.tobytes(), jj.tobytes(), sym)
        if self.plan is None:
            rows_full, cols_full, mirror = _expand_full_pattern(ii, jj, vv, sym)
            self._mirror = mirror
            self.plan = _factor.analyze(
                nrow, rows_full, cols_full, genie=self.genie,
                ordering=params.ordering, scaling=params.scaling,
                pivot_epsilon=params.pivot_epsilon,
                refine_steps=params.refinement_nstep,
                dense_threshold=params.dense_threshold,
                max_block=params.max_block,
            )
            self._structure = structure
            plan = self.plan
            self._fact_fn = jax.jit(lambda d: _factor.numeric_factorize(plan, d))
            self._solve_fn = jax.jit(lambda f, b: _factor.factor_solve(plan, f, b))
            self.stats.main["solver"] = plan.genie.value
            self.stats.matrix.update(
                nrow=nrow, ncol=ncol, nnz=int(len(ii)),
                complx=bool(np.asarray(vv).dtype.kind == "c"),
                symmetric=sym.name)
            self.stats.requests.update(
                ordering=params.ordering.name, scaling=params.scaling.name)
            self.stats.output["effective_ordering"] = plan.effective_ordering
            self.stats.output["effective_scaling"] = plan.scaling.name
            self.stats.time_nanoseconds["initialize"] = time.perf_counter_ns() - t0
        elif structure != self._structure:
            raise ValueError("subsequent factorizations must use the same structure")

        t1 = time.perf_counter_ns()
        vals = jnp.asarray(vv)
        if self._mirror is not None:
            vals = jnp.concatenate([vals, vals[jnp.asarray(self._mirror)]])
        self.fac = self._fact_fn(vals)
        self.fac["logdet"].block_until_ready()
        self._factorized = True
        mp = float(self.fac["min_pivot"])
        self.stats.output["min_pivot"] = mp
        if "n_perturbed" in self.fac:
            self.stats.output["n_perturbed_pivots"] = int(self.fac["n_perturbed"])
        self.stats.time_nanoseconds["factorize"] = time.perf_counter_ns() - t1
        if params.compute_determinant:
            self._store_determinant()
        if mp == 0.0:
            raise RuntimeError("factorization failed: matrix is singular")
        return self

    def _store_determinant(self):
        # det = phase * exp(logdet) -> (mantissa, 10, exponent); note the
        # scaled matrix determinant must be unscaled: det(A) = det(As)/(prod rs cs)
        logdet = float(self.fac["logdet"])
        from russell_tpu.core import fetch_host
        phase = complex(fetch_host(self.fac["phase"]))
        rs = np.asarray(self.fac["rs"], dtype=np.float64)
        cs = np.asarray(self.fac["cs"], dtype=np.float64)
        log_scale = float(np.sum(np.log(rs)) + np.sum(np.log(cs)))
        log10 = (logdet - log_scale) / np.log(10.0)
        exponent = np.floor(log10)
        mantissa = phase * 10.0 ** (log10 - exponent)
        self.stats.determinant.update(
            mantissa_real=float(mantissa.real),
            mantissa_imag=float(mantissa.imag),
            base=10.0, exponent=float(exponent))

    def determinant(self):
        """(mantissa, base, exponent) with det = mantissa * base**exponent."""
        self._store_determinant()
        d = self.stats.determinant
        m = d["mantissa_real"] + 1j * d["mantissa_imag"]
        if abs(m.imag) == 0.0:
            m = m.real
        return m, d["base"], d["exponent"]

    # -- solve ----------------------------------------------------------------

    def solve(self, rhs, verbose: bool = False):
        """x = A^{-1} rhs (jittable kernel; requires factorize first)."""
        if not self._factorized:
            raise RuntimeError("factorize must be called before solve")
        t0 = time.perf_counter_ns()
        x = self._solve_fn(self.fac, jnp.asarray(rhs))
        x.block_until_ready()
        self.stats.time_nanoseconds["solve"] = time.perf_counter_ns() - t0
        return x

    # functional access for jit composition (e.g. inside ODE steppers)
    def kernel_fns(self):
        """(factorize_fn, solve_fn) pure functions bound to the frozen plan —
        compose these inside larger jitted programs (e.g. Radau5 steps)."""
        plan = self.plan
        if plan is None:
            raise RuntimeError("factorize must be called once to fix the structure")
        mirror = self._mirror

        def fact(vals):
            if mirror is not None:
                vals = jnp.concatenate([vals, vals[jnp.asarray(mirror)]])
            return _factor.numeric_factorize(plan, vals)

        def solve(fac, b):
            return _factor.factor_solve(plan, fac, b)

        return fact, solve
