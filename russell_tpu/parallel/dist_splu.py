"""Distributed sparse LU: the packed left-looking SPLU numeric phase
spread over a device mesh.

The reference's MUMPS backend is pinned to sequential mode (MPI disabled,
interface_mumps.c:153); real multifrontal codes parallelize over the
elimination tree. TPU-native version: every packed scan row's Schur
CONTRIBUTION PAIRS (Lhat_im @ A_mj products feeding one contiguous
storage range) are SPLIT across the mesh axis — each device computes the
segment sum of its pair slice and a ``psum`` combines them. That is a
TRUE sum (the single-chip sum up to float reassociation), so it is safe
in f32; the round-1 design combined per-device results with delta-adds
(new - old), which cancel catastrophically in f32 and poisoned the
factors. The post-processing (diagonal inversion / L-panel Dinv
multiply) runs replicated — identical on every device — so the returned
factorization matches ``splu_factorize`` and feeds straight into
``splu_solve``.

Scale-up note: for pod-scale problems the natural refinement is subtree
OWNERSHIP (each device holds the blocks of one elimination subtree and
only separator panels ride the interconnect, "How to Scale Your Model"
recipe); this module implements the pair-sharded variant whose collective
traffic is one (TL+1, b*b) psum per scan row.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from russell_tpu.sparse.splu import SpluPlan, _init_states, _scan_packed

__all__ = ["dist_splu_factorize"]


def dist_splu_factorize(mesh: Mesh, plan: SpluPlan, data, axis: str = "rows"):
    """Numeric SPLU with each scan row's contribution pairs sharded over
    ``mesh``. Returns the same factorization dict as ``splu_factorize``
    (usable with ``splu_solve``); works on any plan (packed schedules are
    always built, at every scale)."""
    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    pk = plan.packed
    TL = pk["TL"]
    CP = pk["pair_l"].shape[1]
    CPp = -(-CP // ndev) * ndev

    def pad_pairs(a, fill):
        if CPp == CP:
            return np.asarray(a)
        return np.concatenate(
            [a, np.full((a.shape[0], CPp - CP), fill, dtype=a.dtype)],
            axis=1)

    # pad slots: l = u = 0 -> scratch zero block, zero product; seg = TL
    # -> dropped by the segment sum
    pair_l = pad_pairs(pk["pair_l"], 0)
    pair_u = pad_pairs(pk["pair_u"], 0)
    pair_seg = pad_pairs(pk["pair_seg"], TL)

    states, deltas, cplxs = _init_states(plan, (data,))
    blocks0, ld0, mp0, np0, ph0 = states[0]
    fixed = {k: np.asarray(pk[k]) for k in
             ("t0", "len", "nd", "dinv", "dloc")}

    def run(blocks, delta, pl_j, pu_j, ps_j):
        xs = {k: jnp.asarray(v) for k, v in fixed.items()}
        xs.update(pair_l=pl_j, pair_u=pu_j, pair_seg=ps_j)
        st = ((blocks, ld0, mp0, np0, ph0),)
        (out,) = _scan_packed(plan, st, (delta,), cplxs, xs,
                              psum_axis=axis)
        return out

    fn = shard_map(
        run, mesh=mesh,
        in_specs=(P(), P(), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(), P(), P(), P(), P()))
    blocks, ld, mp, npert, ph = fn(
        blocks0, deltas[0], jnp.asarray(pair_l), jnp.asarray(pair_u),
        jnp.asarray(pair_seg))
    return {
        "blocks": blocks,
        "logdet": ld,
        "phase": ph,
        "min_pivot": mp,
        "n_perturbed": npert,
    }
