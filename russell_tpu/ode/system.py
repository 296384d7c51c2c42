"""ODE/DAE system definition (reference: russell_ode/src/system.rs:64-233).

TPU-first redesign: the rhs and Jacobian are *pure traced JAX functions*
returning arrays (no fill-in-place closures):

- ``function(x, y, args) -> f`` — the rhs; traced and jitted into every
  stepper kernel.
- Jacobian options, in order of preference:
  1. ``set_jacobian((ii, jj), fn)`` — analytical sparse Jacobian:
     ``fn(x, y, args) -> vals`` aligned with the frozen (ii, jj) structure
     (the structure-frozen contract of lin_solver.rs:17-28 == jit shape
     stability).
  2. autodiff (default when no jacobian is given and
     ``use_numerical_jacobian`` is False): ``jax.jacfwd`` of the rhs —
     the idiomatic JAX replacement for the reference's "analytical
     jacobian"; exact to machine precision.
  3. numerical forward differences (sparse.numerical_jacobian semantics)
     when ``ParamsNewton.use_numerical_jacobian`` is set — matches the
     reference's function-evaluation counters (n_function += ndim).
- ``set_mass(coo)`` — constant mass matrix M (DAE; Radau5 only, as in
  ode_solver.rs:137).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from russell_tpu.sparse.coo import CooMatrix
from russell_tpu.sparse.enums import Sym

__all__ = ["System", "NoArgs"]

NoArgs = type(None)


class System:
    """Defines M dy/dx = f(x, y) with optional sparse Jacobian structure."""

    def __init__(self, ndim: int, function: Callable,
                 symmetric: Sym = Sym.NO):
        if ndim < 1:
            raise ValueError("ndim must be >= 1")
        self.ndim = int(ndim)
        self.function = function
        self.symmetric = symmetric
        self.jacobian: Optional[Callable] = None
        self.jac_structure: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self.mass: Optional[CooMatrix] = None
        # optional structure hint (nr, nc, s) for grid-stencil Jacobians
        # (species-major layout var = k*nr*nc + r*nc + c) — unlocks the
        # GRIDMF multifrontal factorization path
        self.grid: Optional[Tuple[int, int, int]] = None

    # -- jacobian ------------------------------------------------------------

    def set_jacobian(self, structure, fn: Callable) -> None:
        """Analytical Jacobian: ``fn(x, y, args) -> vals`` for the fixed
        (ii, jj) ``structure`` (system.rs:198; the α scaling of the
        reference's callback is applied by the steppers)."""
        ii, jj = structure
        ii = np.asarray(ii, dtype=np.int64)
        jj = np.asarray(jj, dtype=np.int64)
        if len(ii) != len(jj):
            raise ValueError("structure arrays must have equal length")
        self.jac_structure = (ii, jj)
        self.jacobian = fn

    def dense_structure(self) -> Tuple[np.ndarray, np.ndarray]:
        """Full ndim x ndim structure (used by autodiff/numerical paths)."""
        n = self.ndim
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        return ii.ravel(), jj.ravel()

    @property
    def jac_nnz(self) -> int:
        if self.jac_structure is not None:
            return len(self.jac_structure[0])
        return self.ndim * self.ndim

    def jac_values_fn(self, use_numerical: bool = False):
        """Returns ((ii, jj), fn(x, y, args) -> vals) choosing between the
        analytical, autodiff, and numerical paths. The returned fn is
        jit-composable."""
        if self.jacobian is not None and not use_numerical:
            return self.jac_structure, self.jacobian

        ii, jj = self.dense_structure()
        if not use_numerical:
            f = self.function

            def ad_vals(x, y, args):
                jac = jax.jacfwd(lambda yy: f(x, yy, args))(y)
                return jac.reshape(-1)

            return (ii, jj), ad_vals

        f = self.function

        def num_vals(x, y, args):
            # forward differences, one rhs eval per column
            # (russell_sparse/src/numerical_jacobian.rs:129 semantics)
            fy = f(x, y, args)
            eps = jnp.sqrt(jnp.finfo(y.dtype).eps)

            def col(j):
                dyj = eps * jnp.maximum(1e-5, jnp.abs(y[j]))
                yp = y.at[j].add(dyj)
                return (f(x, yp, args) - fy) / dyj

            cols = jax.vmap(col)(jnp.arange(self.ndim))  # (ncol, ndim)
            return cols.T.reshape(-1)

        return (ii, jj), num_vals

    # -- mass ----------------------------------------------------------------

    def set_mass(self, mass: CooMatrix) -> None:
        """Constant mass matrix for DAEs (system.rs:233)."""
        if mass.nrow != self.ndim or mass.ncol != self.ndim:
            raise ValueError("mass matrix must be ndim x ndim")
        self.mass = mass
