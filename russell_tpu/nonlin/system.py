"""Nonlinear system G(u, λ) = 0 definition.

Reference contract: russell_nonlin/src/system.rs — calc_gg computes the
residual, calc_jac computes Gu = dG/du (sparse, frozen structure) and
Gλ = dG/dλ. TPU-first: both are pure traced functions returning arrays;
autodiff (jax.jacfwd) supplies the Jacobian when not provided.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from russell_tpu.sparse.enums import Sym

__all__ = ["System", "NoArgs"]

NoArgs = type(None)


class System:
    """G(u, λ) with sparse Gu structure.

    - ``calc_gg(l, u, args) -> G`` (array of ndim)
    - ``calc_jac(l, u, args) -> (ggu_vals, ggl)`` with ggu_vals aligned to
      the frozen (ii, jj) structure and ggl = dG/dλ (array of ndim)
    """

    def __init__(self, ndim: int, calc_gg: Callable,
                 calc_jac: Optional[Callable] = None,
                 structure: Optional[Tuple] = None,
                 sym_ggu: Sym = Sym.NO):
        if ndim < 1:
            raise ValueError("ndim must be >= 1")
        self.ndim = ndim
        self.calc_gg = calc_gg
        self.sym_ggu = sym_ggu
        if calc_jac is not None:
            if structure is None:
                raise ValueError("structure (ii, jj) is required with an "
                                 "analytical calc_jac")
            ii, jj = structure
            self.jac_ii = np.asarray(ii, dtype=np.int64)
            self.jac_jj = np.asarray(jj, dtype=np.int64)
            self.calc_jac = calc_jac
        else:
            # autodiff over u and lambda (dense structure)
            ii, jj = np.meshgrid(np.arange(ndim), np.arange(ndim),
                                 indexing="ij")
            self.jac_ii = ii.ravel()
            self.jac_jj = jj.ravel()
            gg = calc_gg

            def ad_jac(l, u, args):
                ggu = jax.jacfwd(lambda uu: jnp.asarray(gg(l, uu, args)))(u)
                ggl = jax.jacfwd(lambda ll: jnp.asarray(gg(ll, u, args)))(
                    jnp.asarray(l, dtype=jnp.asarray(u).dtype))
                return ggu.reshape(-1), jnp.reshape(ggl, (-1,))

            self.calc_jac = ad_jac

    @property
    def nnz_ggu(self) -> int:
        return len(self.jac_ii)

    def check_ggu(self, l: float, u, args=None, tol: float = 1e-8):
        """Compare the analytical Gu against autodiff (system.rs:check_ggu)."""
        u = jnp.asarray(u, dtype=jnp.result_type(float))
        vals, _ = self.calc_jac(l, u, args)
        dense = np.zeros((self.ndim, self.ndim))
        np.add.at(dense, (self.jac_ii, self.jac_jj), np.asarray(vals))
        if self.sym_ggu.triangular():
            off = self.jac_ii != self.jac_jj
            np.add.at(dense, (self.jac_jj[off], self.jac_ii[off]),
                      np.asarray(vals)[off])
        gg = self.calc_gg
        ad = np.asarray(jax.jacfwd(lambda uu: jnp.asarray(gg(l, uu, args)))(u))
        err = np.max(np.abs(dense - ad))
        if err > tol:
            raise AssertionError(f"analytical Gu disagrees with autodiff: "
                                 f"max err = {err}")
