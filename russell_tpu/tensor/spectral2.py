"""Spectral decomposition of symmetric second-order tensors.

Reference contract: russell_tensor/src/spectral2.rs:6,39,83 — decompose a
symmetric Tensor2 into eigenvalues + eigenprojectors, and compose a new
tensor from modified eigenvalues (the backbone of principal-space
constitutive models). Eigen-decomposition via jnp.linalg.eigh (the XLA
kernel replacing LAPACK dsyev / mat_eigen_sym).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from russell_tpu.tensor.enums import Mandel
from russell_tpu.tensor.tensor2 import Tensor2

__all__ = ["Spectral2"]


class Spectral2:
    def __init__(self, two_dim: bool = False):
        self.mandel = Mandel.SYMMETRIC_2D if two_dim else Mandel.SYMMETRIC
        self.lambdas = jnp.zeros(3)
        self.projectors = [Tensor2(self.mandel) for _ in range(3)]

    def decompose(self, tt: Tensor2):
        """Eigenvalues + eigenprojectors P_i = n_i dyad n_i
        (spectral2.rs:39)."""
        if not tt.mandel.symmetric():
            raise ValueError("tensor must be symmetric")
        if tt.mandel != self.mandel:
            raise ValueError("tensor has the wrong Mandel basis")
        m = tt.as_matrix()
        w, v = jnp.linalg.eigh(m)
        self.lambdas = w
        self.projectors = []
        for i in range(3):
            n = v[:, i]
            proj = jnp.outer(n, n)
            self.projectors.append(Tensor2.from_matrix(proj, self.mandel)
                                   if not self.mandel.two_dim()
                                   else Tensor2(self.mandel, jnp.stack(
                                       [proj[0, 0], proj[1, 1], proj[2, 2],
                                        np.sqrt(2.0) * proj[0, 1]])))
        return self

    def compose(self, lambdas) -> Tensor2:
        """T = sum_i lambda_i P_i (spectral2.rs:83)."""
        lambdas = jnp.asarray(lambdas)
        v = jnp.zeros(self.mandel.dim())
        for i in range(3):
            v = v + lambdas[i] * self.projectors[i].vec
        return Tensor2(self.mandel, v)
