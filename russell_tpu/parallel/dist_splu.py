"""Distributed sparse LU: the level-batched SPLU numeric phase spread
over a device mesh.

The reference's MUMPS backend is pinned to sequential mode (MPI disabled,
interface_mumps.c:153); real multifrontal codes parallelize over the
elimination tree. TPU-native version: every level chunk's independent
block columns are SPLIT across the mesh axis — each device eliminates its
share (diagonal LU + panel TRSMs on its columns) and contributes its
Schur updates; a ``psum`` over the additive update array combines them
(disjoint writes, so the sum is exact). ICI carries only the update
traffic; the elimination-tree structure is identical to the single-chip
path, so results match splu_factorize exactly (up to float summation
order of disjoint adds, which do not overlap -> bit-equal).

Scale-up note: for pod-scale problems the natural refinement is subtree
OWNERSHIP (each device holds the blocks of one elimination subtree and
only separator panels ride the interconnect, "How to Scale Your Model"
recipe); this module implements the level-sharded variant that XLA GSPMD
handles well at single-host scale.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from russell_tpu.sparse.splu import SpluPlan

__all__ = ["dist_splu_factorize"]


def dist_splu_factorize(mesh: Mesh, plan: SpluPlan, data, axis: str = "rows"):
    """Numeric SPLU with each level chunk's columns sharded over ``mesh``.

    Returns the same factorization dict as ``splu_factorize`` (usable with
    ``splu_solve``). Requires a level schedule (``plan.lvl_cols``)."""
    if plan.lvl_cols is None:
        raise ValueError("dist_splu_factorize requires a level schedule "
                         "(splu_analyze with the default settings)")
    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    b, nb, nblk = plan.b, plan.nb, plan.nblk
    data = jnp.asarray(data)
    dtype = data.dtype

    # pad chunk width to a multiple of the mesh size
    lvl = plan.lvl_cols
    w = lvl.shape[1]
    w_pad = -(-w // ndev) * ndev
    lvl = np.concatenate(
        [lvl, np.full((lvl.shape[0], w_pad - w), nb, dtype=lvl.dtype)],
        axis=1)

    flat = jnp.zeros(nblk * b * b, dtype=dtype)
    if len(plan.pad_idx):
        flat = flat.at[jnp.asarray(plan.pad_idx)].set(1.0)
    flat = flat.at[jnp.asarray(plan.scatter_idx)].add(data)
    blocks0 = flat.reshape(nblk, b, b)

    delta = plan.pivot_epsilon * (1.0 + jnp.max(jnp.abs(data)))
    eye = jnp.eye(b, dtype=dtype)

    def ext(a):
        return jnp.asarray(
            np.concatenate([a, np.zeros((1,) + a.shape[1:], a.dtype)]))

    diag_e = jnp.asarray(np.append(plan.diag_idx, 0))
    l_e = ext(plan.l_idx)
    u_e = ext(plan.u_idx)
    upd_e = ext(plan.upd_idx)
    lrow_e = ext(plan.lrow_idx)
    lvl_j = jnp.asarray(lvl)

    def inv_pert(D):
        lu, piv = jax.scipy.linalg.lu_factor(D)
        dmin = jnp.min(jnp.abs(jnp.diagonal(lu)))
        lu2, piv2 = jax.scipy.linalg.lu_factor(D + delta.astype(dtype) * eye)
        bad = dmin <= delta
        lu = jnp.where(bad, lu2, lu)
        piv = jnp.where(bad, piv2, piv)
        Dinv = jax.scipy.linalg.lu_solve((lu, piv), eye)
        dg = jnp.abs(jnp.diagonal(lu))
        return Dinv, jnp.sum(jnp.log(jnp.maximum(dg, 1e-300))), jnp.min(dg)

    def shard_level(blocks, cols):
        """Per-device slice of one level chunk; returns the additive update
        to ``blocks`` (disjoint across devices, summed with psum). Runs
        under shard_map: cols is the local (w_pad/ndev,) slice."""
        live = cols < nb
        dk = diag_e[cols]
        Dinv, ldw, mpw = jax.vmap(inv_pert)(blocks[dk])

        zero_blk = jnp.zeros((b, b), dtype=dtype)
        upd = jnp.zeros_like(blocks)
        upd = upd.at[dk].add(Dinv - blocks[dk]).at[0].set(zero_blk)

        li = l_e[cols]
        Ablk = blocks[li]
        Lhat = jnp.einsum("waij,wjk->waik", Ablk, Dinv,
                          preferred_element_type=dtype)
        upd = upd.at[li].add(Lhat - Ablk).at[0].set(zero_blk)

        Ublk = blocks[u_e[cols]]
        prod = jnp.einsum("waij,wbjk->wabik", Lhat, Ublk,
                          preferred_element_type=dtype)
        upd = upd.at[upd_e[cols]].add(-prod).at[0].set(zero_blk)

        upd = lax.psum(upd, axis)
        ld = lax.psum(jnp.sum(jnp.where(live, ldw, 0.0)), axis)
        mp = lax.pmin(jnp.min(jnp.where(live, mpw, jnp.inf)), axis)
        return upd, ld, mp

    sharded = shard_map(
        shard_level, mesh=mesh,
        in_specs=(P(), P(axis)), out_specs=(P(), P(), P()))

    rdtype = jnp.zeros((), dtype=dtype).real.dtype

    def level_step(carry, cols):
        blocks, ld, mp = carry
        upd, ldw, mpw = sharded(blocks, cols)
        return (blocks + upd, ld + ldw, jnp.minimum(mp, mpw)), None

    carry0 = (blocks0, jnp.zeros((), rdtype),
              jnp.asarray(jnp.inf, dtype=rdtype))
    (blocks, ld, mp), _ = lax.scan(level_step, carry0, lvl_j)
    return {
        "blocks": blocks,
        "logdet": ld,
        "phase": jnp.ones((), dtype=dtype),
        "min_pivot": mp,
        "n_perturbed": jnp.zeros((), dtype=jnp.int32),
    }
