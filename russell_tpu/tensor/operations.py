"""Tensor operations — dots, double-dots, dyads.

Reference contracts: russell_tensor/src/{operations_t2.rs,
operations_t4.rs, operations_mix1.rs, operations_mix2.rs}. In the Mandel
basis each reduces to a vector/matrix product (MXU-native):

- a : b        = a_vec . b_vec                 (t2_ddot_t2)
- D : a        = D_mat @ a_vec                 (t4_ddot_t2)
- a : D        = D_mat^T @ a_vec               (t2_ddot_t4)
- C : D        = C_mat @ D_mat                 (t4_ddot_t4)
- a dyad b     = outer(a_vec, b_vec)           (t2_dyad_t2)
- odyad/udyad/qsd built from the 3x3 forms.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from russell_tpu.tensor.enums import Mandel
from russell_tpu.tensor.tensor2 import Tensor2
from russell_tpu.tensor.tensor4 import Tensor4

__all__ = ["t2_ddot_t2", "t2_dot_t2", "t2_dyad_t2", "t2_odyad_t2",
           "t2_udyad_t2", "t2_qsd_t2", "t4_ddot_t2", "t2_ddot_t4",
           "t4_ddot_t4", "vec_dyad_vec", "t2_add", "t4_add"]

SQRT2 = math.sqrt(2.0)

# Mandel index -> (i, j) for the 9D basis
M_TO_IJ = [(0, 0), (1, 1), (2, 2), (0, 1), (1, 2), (0, 2), (1, 0), (2, 1),
           (2, 0)]


def _same(a: Tensor2, b: Tensor2):
    if a.mandel != b.mandel:
        raise ValueError("tensors must have the same Mandel basis")


def t2_ddot_t2(a: Tensor2, b: Tensor2):
    """s = a : b (operations_t2.rs)."""
    _same(a, b)
    return jnp.sum(a.vec * b.vec)


def t2_dot_t2(a: Tensor2, b: Tensor2) -> Tensor2:
    """c = a . b (single contraction); result is GENERAL unless both are
    diagonal-compatible."""
    m = a.as_matrix() @ b.as_matrix()
    return Tensor2.from_matrix(m, Mandel.GENERAL)


def t2_dyad_t2(alpha, a: Tensor2, b: Tensor2) -> Tensor4:
    """D = alpha a dyad b (operations_t2.rs)."""
    _same(a, b)
    return Tensor4(a.mandel, alpha * jnp.outer(a.vec, b.vec))


def _mandel_basis_entry(vec, i, j, mandel):
    """(i,j) entry of the 3x3 matrix from a Mandel vector — numpy helper."""
    t = Tensor2(mandel, vec)
    return t.as_matrix()[i, j]


def _build_from_3x3_form(alpha, A, B, formula, mandel: Mandel) -> Tensor4:
    """Generic D[(ij),(kl)] = alpha * formula(A, B, i, j, k, l) expressed in
    the (symmetric) Mandel matrix basis — the minor-symmetrized projection,
    matching the reference's usage in constitutive models."""
    assert mandel.symmetric()
    n = mandel.dim()
    rows = []
    for mi in range(n):
        i, j = M_TO_IJ[mi]
        row = []
        for mj in range(n):
            k, l = M_TO_IJ[mj]
            # Mandel basis weights: sqrt(2) factors for off-diagonal slots
            wij = 1.0 if mi < 3 else SQRT2
            wkl = 1.0 if mj < 3 else SQRT2
            if mi < 3 and mj < 3:
                val = formula(A, B, i, j, k, l)
            elif mi < 3:
                val = 0.5 * (formula(A, B, i, j, k, l)
                             + formula(A, B, i, j, l, k)) * wkl
            elif mj < 3:
                val = 0.5 * (formula(A, B, i, j, k, l)
                             + formula(A, B, j, i, k, l)) * wij
            else:
                val = 0.25 * (formula(A, B, i, j, k, l)
                              + formula(A, B, i, j, l, k)
                              + formula(A, B, j, i, k, l)
                              + formula(A, B, j, i, l, k)) * wij * wkl
            row.append(val)
        rows.append(jnp.stack(row))
    return Tensor4(mandel, alpha * jnp.stack(rows))


def t2_odyad_t2(alpha, a: Tensor2, b: Tensor2) -> Tensor4:
    """D = alpha (a obar b): D_ijkl = a_ik b_jl (operations_t2.rs).

    Result in the SYMMETRIC basis via the symmetrized projection (valid
    when contracted with symmetric tensors, as in the reference usage)."""
    A = a.as_matrix()
    B = b.as_matrix()
    return _build_from_3x3_form(
        alpha, A, B, lambda A, B, i, j, k, l: A[i, k] * B[j, l],
        a.mandel if a.mandel.symmetric() else Mandel.SYMMETRIC)


def t2_udyad_t2(alpha, a: Tensor2, b: Tensor2) -> Tensor4:
    """D = alpha (a ubar b): D_ijkl = a_il b_jk."""
    A = a.as_matrix()
    B = b.as_matrix()
    return _build_from_3x3_form(
        alpha, A, B, lambda A, B, i, j, k, l: A[i, l] * B[j, k],
        a.mandel if a.mandel.symmetric() else Mandel.SYMMETRIC)


def t2_qsd_t2(alpha, a: Tensor2, b: Tensor2) -> Tensor4:
    """D = alpha (a qsd b) = alpha/2 (a obar b + a ubar b + b obar a +
    b ubar a) — the quad-symmetrized dyad (operations_t2.rs)."""
    h = alpha * 0.5
    o1 = t2_odyad_t2(h, a, b)
    u1 = t2_udyad_t2(h, a, b)
    o2 = t2_odyad_t2(h, b, a)
    u2 = t2_udyad_t2(h, b, a)
    return Tensor4(o1.mandel, o1.mat + u1.mat + o2.mat + u2.mat)


def t4_ddot_t2(alpha, dd: Tensor4, a: Tensor2) -> Tensor2:
    """b = alpha D : a = alpha D_mat @ a_vec (operations_mix1.rs)."""
    if dd.mandel != a.mandel:
        raise ValueError("tensors must have the same Mandel basis")
    return Tensor2(a.mandel, alpha * (dd.mat @ a.vec))


def t2_ddot_t4(alpha, a: Tensor2, dd: Tensor4) -> Tensor2:
    """b = alpha a : D = alpha D_mat^T @ a_vec."""
    if dd.mandel != a.mandel:
        raise ValueError("tensors must have the same Mandel basis")
    return Tensor2(a.mandel, alpha * (dd.mat.T @ a.vec))


def t4_ddot_t4(alpha, cc: Tensor4, dd: Tensor4) -> Tensor4:
    """E = alpha C : D = alpha C_mat @ D_mat (operations_t4.rs)."""
    if cc.mandel != dd.mandel:
        raise ValueError("tensors must have the same Mandel basis")
    return Tensor4(cc.mandel, alpha * (cc.mat @ dd.mat))


def vec_dyad_vec(alpha, u, v, mandel: Mandel = Mandel.SYMMETRIC) -> Tensor2:
    """T = alpha (u dyad v), symmetrized for symmetric bases
    (operations_mix2.rs)."""
    u = jnp.asarray(u, dtype=jnp.result_type(float))
    v = jnp.asarray(v, dtype=jnp.result_type(float))
    m = alpha * jnp.outer(u, v)
    if mandel.symmetric():
        m = 0.5 * (m + m.T)
    return Tensor2.from_matrix(m, mandel)


def t2_add(alpha, a: Tensor2, beta, b: Tensor2) -> Tensor2:
    _same(a, b)
    return Tensor2(a.mandel, alpha * a.vec + beta * b.vec)


def t4_add(alpha, a: Tensor4, beta, b: Tensor4) -> Tensor4:
    if a.mandel != b.mandel:
        raise ValueError("tensors must have the same Mandel basis")
    return Tensor4(a.mandel, alpha * a.mat + beta * b.mat)
