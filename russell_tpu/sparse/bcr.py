"""Block cyclic reduction (BCR) for block-tridiagonal systems.

The sequential banded kernel (factor.py BANDED) is a ``lax.scan`` over nb
block rows — nb sequential dense steps. BCR restructures the elimination
into ceil(log2(nb)) *levels*; within a level every block operation is
independent, so each level is one **batched** LU/TRSM/GEMM (vmapped onto
the MXU) and neighbor access is a shift — which GSPMD lowers to a
``collective-permute`` over ICI when the block axis is sharded across a
mesh. This is both the fast single-chip path (log depth instead of linear)
and the distributed factorization of SURVEY.md §7 step 9.

Scheme (eliminate odd block rows per level):
  D'_i = D_i - Gl_i F_{i-1} - Hr_i E_{i+1}
  E'_i = -Gl_i E_{i-1}
  F'_i = -Hr_i F_{i+1}          with  Gl_i = E_i D_{i-1}^{-1},
                                      Hr_i = F_i D_{i+1}^{-1}
  b'_i = b_i - Gl_i b_{i-1} - Hr_i b_{i+1}
Back-substitution per level (reverse): odd rows solved from their even
neighbors. Diagonal LUs use local partial pivoting + static perturbation;
factor.py wraps BCR with equilibration and iterative refinement.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["bcr_factorize", "bcr_solve", "bcr_levels"]


def bcr_levels(nb: int) -> int:
    return max(1, math.ceil(math.log2(max(nb, 2))))


def _pad_pow2(D, E, F):
    """Pad the block arrays to a power-of-two count with identity blocks."""
    nb, k, _ = D.shape
    M = 1 << bcr_levels(nb)
    if M == nb:
        return D, E, F, nb
    eye = jnp.broadcast_to(jnp.eye(k, dtype=D.dtype), (M - nb, k, k))
    zero = jnp.zeros((M - nb, k, k), dtype=D.dtype)
    return (jnp.concatenate([D, eye]), jnp.concatenate([E, zero]),
            jnp.concatenate([F, zero]), nb)


def _lu_static(D, delta):
    """Batched LU with static pivot perturbation on tiny pivots."""
    k = D.shape[-1]
    eye = jnp.eye(k, dtype=D.dtype)

    def one(S):
        lu, piv = jax.scipy.linalg.lu_factor(S)
        bad = jnp.min(jnp.abs(jnp.diagonal(lu))) <= delta

        def redo(_):
            return jax.scipy.linalg.lu_factor(S + delta.astype(S.dtype) * eye)

        return lax.cond(bad, redo, lambda _: (lu, piv), None)

    return jax.vmap(one)(D)


def _apply_inv(lus, pivs, B):
    """X = D^{-1} B for batched LU factors and batched B (m, k, k)."""
    return jax.vmap(lambda lu, piv, b: jax.scipy.linalg.lu_solve((lu, piv),
                                                                 b))(
        lus, pivs, B)


def bcr_factorize(D, E, F, pivot_epsilon: float = 1e-14):
    """Factorize the block-tridiagonal system (D diag, E sub, F super).

    Returns a pytree ``fac`` holding per-level transformed operators:
    everything ``bcr_solve`` needs, with log2(nb) levels of batched
    factorizations.
    """
    delta = pivot_epsilon * (1.0 + jnp.max(jnp.abs(D)))
    D, E, F, nb = _pad_pow2(jnp.asarray(D), jnp.asarray(E), jnp.asarray(F))
    levels = []
    while D.shape[0] > 1:
        m = D.shape[0]
        Do, Eo, Fo = D[1::2], E[1::2], F[1::2]      # odd rows (eliminated)
        De, Ee, Fe = D[0::2], E[0::2], F[0::2]      # even rows (kept)
        lus, pivs = _lu_static(Do, delta)
        # Gl_i = E_i D_{i-1}^{-1}: D_{i-1} is odd block (i//2 - 1)
        DinvF = _apply_inv(lus, pivs, Fo)           # D_o^{-1} F_o
        DinvE = _apply_inv(lus, pivs, Eo)           # D_o^{-1} E_o
        # for even index q (block 2q): left odd is q-1, right odd is q
        DinvF_left = jnp.roll(DinvF, 1, axis=0).at[0].set(0.0)
        DinvE_left = jnp.roll(DinvE, 1, axis=0).at[0].set(0.0)
        D_new = (De
                 - jnp.einsum("qij,qjk->qik", Ee, DinvF_left,
                              preferred_element_type=D.dtype)
                 - jnp.einsum("qij,qjk->qik", Fe, DinvE,
                              preferred_element_type=D.dtype))
        E_new = -jnp.einsum("qij,qjk->qik", Ee, DinvE_left,
                            preferred_element_type=D.dtype)
        F_new = -jnp.einsum("qij,qjk->qik", Fe, DinvF,
                            preferred_element_type=D.dtype)
        levels.append({"lus": lus, "pivs": pivs, "Ee": Ee, "Fe": Fe,
                       "Eo": Eo, "Fo": Fo})
        D, E, F = D_new, E_new, F_new
    lus, pivs = _lu_static(D, delta)
    root = {"lus": lus, "pivs": pivs}
    mp = jnp.min(jnp.abs(jnp.diagonal(root["lus"], axis1=-2, axis2=-1)))
    for lv in levels:
        mp = jnp.minimum(mp, jnp.min(jnp.abs(
            jnp.diagonal(lv["lus"], axis1=-2, axis2=-1))))
    return {"levels": levels, "root": root, "min_pivot": mp}


def bcr_solve(fac, bp):
    """Solve with a bcr_factorize result; ``bp`` is (nb, k)."""
    nb, k = bp.shape
    dtype = fac["root"]["lus"].dtype
    levels = fac["levels"]
    M = 2 * levels[0]["lus"].shape[0] if levels else 1
    b = jnp.zeros((M, k), dtype=dtype).at[:nb].set(bp.astype(dtype))

    # forward reduction
    bs = []
    for lv in fac["levels"]:
        bo = b[1::2]
        be = b[0::2]
        y = jax.vmap(lambda lu, piv, v: jax.scipy.linalg.lu_solve(
            (lu, piv), v))(lv["lus"], lv["pivs"], bo)   # D_o^{-1} b_o
        y_left = jnp.roll(y, 1, axis=0).at[0].set(0.0)
        b_new = (be
                 - jnp.einsum("qij,qj->qi", lv["Ee"], y_left,
                              preferred_element_type=dtype)
                 - jnp.einsum("qij,qj->qi", lv["Fe"], y,
                              preferred_element_type=dtype))
        bs.append(bo)
        b = b_new

    # root solve
    x = jax.vmap(lambda lu, piv, v: jax.scipy.linalg.lu_solve((lu, piv),
                                                              v))(
        fac["root"]["lus"], fac["root"]["pivs"], b)

    # back-substitution
    for lv, bo in zip(reversed(fac["levels"]), reversed(bs)):
        xe = x                                        # even rows, known
        xe_right = jnp.roll(xe, -1, axis=0).at[-1].set(0.0)
        rhs = (bo
               - jnp.einsum("qij,qj->qi", lv["Eo"], xe,
                            preferred_element_type=dtype)
               - jnp.einsum("qij,qj->qi", lv["Fo"], xe_right,
                            preferred_element_type=dtype))
        xo = jax.vmap(lambda lu, piv, v: jax.scipy.linalg.lu_solve(
            (lu, piv), v))(lv["lus"], lv["pivs"], rhs)
        m2 = xe.shape[0] + xo.shape[0]
        x = jnp.zeros((m2, k), dtype=dtype)
        x = x.at[0::2].set(xe).at[1::2].set(xo)
    return x[:nb]
