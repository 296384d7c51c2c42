"""Fourth-order tensor as a Mandel matrix.

Reference contract: russell_tensor/src/tensor4.rs:102 — a (9x9 / 6x6 /
4x4) matrix in the Mandel basis; classic constant tensors (identity II,
transpose TT, trace projector, symmetric/deviatoric projectors Psym/Pdev/
Piso) as in constants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from russell_tpu.tensor.enums import Mandel

__all__ = ["Tensor4"]


class Tensor4:
    def __init__(self, mandel: Mandel, mat=None):
        self.mandel = mandel
        n = mandel.dim()
        if mat is None:
            self.mat = jnp.zeros((n, n))
        else:
            mat = jnp.asarray(mat, dtype=jnp.result_type(float))
            if mat.shape[-2:] != (n, n):
                raise ValueError("matrix dims must match the Mandel basis")
            self.mat = mat

    @classmethod
    def new(cls, mandel: Mandel) -> "Tensor4":
        return cls(mandel)

    # -- classic constant tensors (tensor4.rs constants) ----------------------

    @classmethod
    def identity(cls, mandel: Mandel) -> "Tensor4":
        """II : A = A (the Mandel identity matrix)."""
        return cls(mandel, jnp.eye(mandel.dim()))

    @classmethod
    def ii_dyad_ii(cls, mandel: Mandel) -> "Tensor4":
        """(I dyad I) : A = tr(A) I."""
        n = mandel.dim()
        m = np.zeros((n, n))
        m[:3, :3] = 1.0
        return cls(mandel, m)

    @classmethod
    def p_iso(cls, mandel: Mandel) -> "Tensor4":
        """Isotropic projector Piso = (1/3) I dyad I."""
        return cls(mandel, cls.ii_dyad_ii(mandel).mat / 3.0)

    @classmethod
    def p_sym(cls, mandel: Mandel) -> "Tensor4":
        """Symmetrizing projector Psym (identity on the symmetric 6D part)."""
        n = mandel.dim()
        m = np.eye(n)
        if mandel == Mandel.GENERAL:
            m[6:, 6:] = 0.0
        return cls(mandel, m)

    @classmethod
    def p_skew(cls, mandel: Mandel) -> "Tensor4":
        n = mandel.dim()
        m = np.zeros((n, n))
        if mandel == Mandel.GENERAL:
            m[6:, 6:] = np.eye(3)
        return cls(mandel, m)

    @classmethod
    def p_dev(cls, mandel: Mandel) -> "Tensor4":
        """Deviatoric projector Pdev = Psym - Piso."""
        return cls(mandel, cls.p_sym(mandel).mat - cls.p_iso(mandel).mat)

    # -- conversions ----------------------------------------------------------

    def as_matrix_9x9(self):
        """Embed into the full 9x9 Mandel matrix (as_matrix_9x9.rs)."""
        n = self.mandel.dim()
        m = jnp.zeros((9, 9))
        return m.at[:n, :n].set(self.mat)

    def scale(self, alpha) -> "Tensor4":
        return Tensor4(self.mandel, alpha * self.mat)

    def clone(self) -> "Tensor4":
        return Tensor4(self.mandel, self.mat)

    def __repr__(self):
        return f"Tensor4({self.mandel.name})"
