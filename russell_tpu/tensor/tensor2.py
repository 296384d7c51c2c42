"""Second-order tensor in the Mandel basis.

Reference contract: russell_tensor/src/tensor2.rs:52 — storage:

General (9D):   [T00, T11, T22, (T01+T10)/s2, (T12+T21)/s2, (T02+T20)/s2,
                 (T01-T10)/s2, (T12-T21)/s2, (T02-T20)/s2]
Symmetric (6D): [T00, T11, T22, s2*T01, s2*T12, s2*T02]
Symmetric2D(4): [T00, T11, T22, s2*T01]

with s2 = sqrt(2). Invariants (I1, I2, I3, J2, J3, sigma_m/sigma_d, Lode)
follow tensor2.rs.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from russell_tpu.tensor.enums import Mandel

__all__ = ["Tensor2"]

SQRT2 = math.sqrt(2.0)
SQRT3 = math.sqrt(3.0)
SQRT6 = math.sqrt(6.0)
TOL_J2 = 1e-10


class Tensor2:
    """Mandel-vector second-order tensor (vmappable pytree-like)."""

    def __init__(self, mandel: Mandel, vec=None):
        self.mandel = mandel
        if vec is None:
            self.vec = jnp.zeros(mandel.dim())
        else:
            vec = jnp.asarray(vec, dtype=jnp.result_type(float))
            if vec.shape[-1] != mandel.dim():
                raise ValueError("vector dimension must match the Mandel "
                                 "basis")
            self.vec = vec

    # -- constructors ---------------------------------------------------------

    @classmethod
    def new(cls, mandel: Mandel) -> "Tensor2":
        return cls(mandel)

    @classmethod
    def new_sym(cls, two_dim: bool = False) -> "Tensor2":
        return cls(Mandel.SYMMETRIC_2D if two_dim else Mandel.SYMMETRIC)

    @classmethod
    def from_matrix(cls, tt, mandel: Mandel) -> "Tensor2":
        """3x3 matrix -> Mandel vector (tensor2.rs: from_matrix)."""
        tt = jnp.asarray(tt, dtype=jnp.result_type(float))
        if tt.shape != (3, 3):
            raise ValueError("matrix must be 3x3")
        if mandel.symmetric():
            sym_err = jnp.max(jnp.abs(tt - tt.T))
            if float(sym_err) > 1e-10:
                raise ValueError("cannot set symmetric Tensor2 with a "
                                 "non-symmetric matrix")
            if mandel.two_dim():
                if (float(jnp.abs(tt[0, 2])) > 1e-10
                        or float(jnp.abs(tt[1, 2])) > 1e-10):
                    raise ValueError("cannot set 2D Tensor2 with out-of-"
                                     "plane components")
                vec = jnp.stack([tt[0, 0], tt[1, 1], tt[2, 2],
                                 SQRT2 * tt[0, 1]])
            else:
                vec = jnp.stack([tt[0, 0], tt[1, 1], tt[2, 2],
                                 SQRT2 * tt[0, 1], SQRT2 * tt[1, 2],
                                 SQRT2 * tt[0, 2]])
        else:
            vec = jnp.stack([
                tt[0, 0], tt[1, 1], tt[2, 2],
                (tt[0, 1] + tt[1, 0]) / SQRT2,
                (tt[1, 2] + tt[2, 1]) / SQRT2,
                (tt[0, 2] + tt[2, 0]) / SQRT2,
                (tt[0, 1] - tt[1, 0]) / SQRT2,
                (tt[1, 2] - tt[2, 1]) / SQRT2,
                (tt[0, 2] - tt[2, 0]) / SQRT2])
        return cls(mandel, vec)

    @classmethod
    def identity(cls, mandel: Mandel) -> "Tensor2":
        v = np.zeros(mandel.dim())
        v[:3] = 1.0
        return cls(mandel, v)

    @classmethod
    def from_octahedral(cls, distance, radius, lode, two_dim=False):
        """Diagonal tensor from octahedral invariants (tensor2.rs:147)."""
        theta = math.acos(max(-1.0, min(1.0, lode))) / 3.0
        star1 = radius * math.cos(theta)
        star2 = distance
        star3 = radius * math.sin(theta)
        t = cls.new_sym(two_dim)
        v = np.zeros(t.mandel.dim())
        v[0] = (SQRT2 * star1 + star2) / SQRT3
        v[1] = -star1 / SQRT6 + star2 / SQRT3 - star3 / SQRT2
        v[2] = -star1 / SQRT6 + star2 / SQRT3 + star3 / SQRT2
        return cls(t.mandel, v)

    # -- conversions ----------------------------------------------------------

    def as_matrix(self):
        """Mandel vector -> full 3x3 matrix (tensor2.rs: as_matrix)."""
        v = self.vec
        if self.mandel == Mandel.GENERAL:
            m01 = (v[3] + v[6]) / SQRT2
            m10 = (v[3] - v[6]) / SQRT2
            m12 = (v[4] + v[7]) / SQRT2
            m21 = (v[4] - v[7]) / SQRT2
            m02 = (v[5] + v[8]) / SQRT2
            m20 = (v[5] - v[8]) / SQRT2
            return jnp.stack([jnp.stack([v[0], m01, m02]),
                              jnp.stack([m10, v[1], m12]),
                              jnp.stack([m20, m21, v[2]])])
        z = jnp.zeros(())
        m01 = v[3] / SQRT2
        m12 = v[4] / SQRT2 if self.mandel == Mandel.SYMMETRIC else z
        m02 = v[5] / SQRT2 if self.mandel == Mandel.SYMMETRIC else z
        return jnp.stack([jnp.stack([v[0], m01, m02]),
                          jnp.stack([m01, v[1], m12]),
                          jnp.stack([m02, m12, v[2]])])

    def get(self, i: int, j: int) -> float:
        return float(self.as_matrix()[i, j])

    def sym_part(self) -> "Tensor2":
        if self.mandel != Mandel.GENERAL:
            return Tensor2(self.mandel, self.vec)
        return Tensor2(Mandel.SYMMETRIC, self.vec[:6])

    # -- algebra --------------------------------------------------------------

    def clone(self) -> "Tensor2":
        return Tensor2(self.mandel, self.vec)

    def scale(self, alpha) -> "Tensor2":
        return Tensor2(self.mandel, alpha * self.vec)

    def transpose(self) -> "Tensor2":
        if self.mandel == Mandel.GENERAL:
            v = self.vec
            return Tensor2(self.mandel, jnp.concatenate([v[:6], -v[6:]]))
        return self.clone()

    def squared(self) -> "Tensor2":
        """T . T (tensor2.rs: squared)."""
        m = self.as_matrix() @ self.as_matrix()
        mandel = (Mandel.GENERAL if self.mandel == Mandel.GENERAL
                  else self.mandel)
        if mandel.two_dim():
            return Tensor2(Mandel.SYMMETRIC_2D, jnp.stack(
                [m[0, 0], m[1, 1], m[2, 2], SQRT2 * m[0, 1]]))
        return Tensor2.from_matrix(m, mandel) if mandel == Mandel.GENERAL \
            else Tensor2(Mandel.SYMMETRIC, jnp.stack(
                [m[0, 0], m[1, 1], m[2, 2], SQRT2 * m[0, 1],
                 SQRT2 * m[1, 2], SQRT2 * m[0, 2]]))

    def inverse(self) -> "Tensor2":
        """T^-1 (tensor2.rs: inverse); requires det != 0."""
        m = self.as_matrix()
        inv = jnp.linalg.inv(m)
        if self.mandel == Mandel.GENERAL:
            return Tensor2.from_matrix(inv, Mandel.GENERAL)
        if self.mandel.two_dim():
            return Tensor2(Mandel.SYMMETRIC_2D, jnp.stack(
                [inv[0, 0], inv[1, 1], inv[2, 2], SQRT2 * inv[0, 1]]))
        return Tensor2(Mandel.SYMMETRIC, jnp.stack(
            [inv[0, 0], inv[1, 1], inv[2, 2], SQRT2 * inv[0, 1],
             SQRT2 * inv[1, 2], SQRT2 * inv[0, 2]]))

    def deviator(self) -> "Tensor2":
        """s = T - (I1/3) I (tensor2.rs: deviator)."""
        mean = (self.vec[0] + self.vec[1] + self.vec[2]) / 3.0
        v = self.vec.at[:3].add(-mean)
        return Tensor2(self.mandel, v)

    def norm(self) -> float:
        """Frobenius norm — plain Euclidean norm of the Mandel vector."""
        return float(jnp.linalg.norm(self.vec))

    # -- invariants (tensor2.rs invariants section) ---------------------------

    def trace(self):
        return self.vec[0] + self.vec[1] + self.vec[2]

    def invariant_ii1(self):
        return self.trace()

    def invariant_ii2(self):
        m = self.as_matrix()
        t = self.trace()
        return 0.5 * (t * t - jnp.trace(m @ m))

    def invariant_ii3(self):
        return jnp.linalg.det(self.as_matrix())

    def determinant(self):
        return self.invariant_ii3()

    def invariant_jj2(self):
        """J2 = s:s / 2 of the symmetric part."""
        s = self.sym_part().deviator()
        return 0.5 * jnp.sum(s.vec * s.vec)

    def invariant_jj3(self):
        s = self.sym_part().deviator()
        return jnp.linalg.det(s.as_matrix())

    def invariant_sigma_m(self):
        return self.trace() / 3.0

    def invariant_sigma_d(self):
        return jnp.sqrt(3.0 * jnp.maximum(self.invariant_jj2(), 0.0))

    def invariant_eps_v(self):
        return self.trace()

    def invariant_eps_d(self):
        return 2.0 * jnp.sqrt(jnp.maximum(self.invariant_jj2(), 0.0) / 3.0)

    def invariant_lode(self):
        """l = cos(3 theta) = (3 sqrt3 / 2) J3 / J2^1.5; None-like NaN when
        J2 < tol (tensor2.rs: invariant_lode)."""
        jj2 = self.invariant_jj2()
        jj3 = self.invariant_jj3()
        val = 1.5 * SQRT3 * jj3 / jnp.maximum(jj2, 1e-300) ** 1.5
        return jnp.where(jj2 > TOL_J2, val, jnp.nan)

    # -- octahedral -----------------------------------------------------------

    def octahedral_distance(self):
        return self.trace() / SQRT3

    def octahedral_radius(self):
        s = self.sym_part().deviator()
        return jnp.linalg.norm(s.vec)

    # -- display --------------------------------------------------------------

    def __repr__(self):
        return f"Tensor2({self.mandel.name}, {np.asarray(self.vec)})"
