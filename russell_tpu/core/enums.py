"""Base enums (reference: russell_lab/src/base/enums.rs:5)."""

from __future__ import annotations

import enum

import jax.numpy as jnp

__all__ = ["Norm", "vec_norm", "mat_norm"]


class Norm(enum.Enum):
    """Norm selector, matching russell_lab's ``Norm`` enum.

    - ``ONE``:  1-norm; for matrices, max absolute column sum
    - ``EUC``:  Euclidean norm (vectors)
    - ``FRO``:  Frobenius norm (matrices; == EUC for vectors)
    - ``INF``:  infinity norm; for matrices, max absolute row sum
    - ``MAX``:  largest absolute entry
    """

    ONE = "one"
    EUC = "euc"
    FRO = "fro"
    INF = "inf"
    MAX = "max"


def vec_norm(v, norm: Norm = Norm.EUC):
    """Vector norm (russell_lab vector/vec_norm.rs:7-15). Jittable."""
    v = jnp.asarray(v)
    a = jnp.abs(v)
    if norm == Norm.ONE:
        return jnp.sum(a)
    if norm in (Norm.EUC, Norm.FRO):
        return jnp.linalg.norm(v)
    if norm in (Norm.INF, Norm.MAX):
        return jnp.max(a) if v.size else jnp.asarray(0.0)
    raise ValueError(f"unknown norm {norm}")


def mat_norm(m, norm: Norm = Norm.FRO):
    """Matrix norm (russell_lab matrix/mat_norm.rs). Jittable."""
    m = jnp.asarray(m)
    a = jnp.abs(m)
    if norm == Norm.ONE:
        return jnp.max(jnp.sum(a, axis=0))
    if norm == Norm.INF:
        return jnp.max(jnp.sum(a, axis=1))
    if norm in (Norm.EUC, Norm.FRO):
        return jnp.linalg.norm(m)
    if norm == Norm.MAX:
        return jnp.max(a)
    raise ValueError(f"unknown norm {norm}")
