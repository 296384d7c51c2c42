"""Distributed GENMF: the general-matrix multifrontal with each size
class's node batch sharded over the device mesh.

Same sharding idea as dist_gridmf (subtree ownership expressed through
jax.sharding annotations; XLA's SPMD partitioner inserts collectives),
applied to the manufactured congruence classes of arbitrary patterns:
every (depth, e_pad, r_pad) class is one batched dense pipeline whose
leading node axis shards blockwise when it is divisible by the mesh
size; small classes near the root replicate. Unlike the regular grid's
2i/2i+1 interleave, general extend-add links are data gathers, so some
cross-shard traffic at class boundaries is inherent — the flop-dominant
pivot inversions and Schur GEMMs still run fully sharded.

Math is identical to the single-chip ``genmf_factorize`` (sharding
constraints change layout, never values).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from russell_tpu.sparse.genmf import GenMfPlan, genmf_factorize, genmf_solve


def _plan_fns(plan) -> dict:
    """Per-plan jit cache attached to the plan object (an id(plan)-keyed
    module dict poisons a NEW plan when the GC recycles the id)."""
    st = getattr(plan, "_par_fns", None)
    if st is None:
        st = plan._par_fns = {}
    return st


__all__ = ["dist_genmf_factorize", "dist_genmf_solve"]


def _node_shard(mesh: Mesh, axis: str):
    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    full = NamedSharding(mesh, P())

    def shard(a):
        if a.ndim >= 1 and a.shape[0] % ndev == 0:
            spec = P(axis, *([None] * (a.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, spec))
        return jax.lax.with_sharding_constraint(a, full)

    return shard


# jitted wrappers keyed by (plan identity, mesh, axis) — a fresh
# jax.jit(lambda) per call would recompile every invocation




def dist_genmf_factorize(mesh: Mesh, plan: GenMfPlan, data,
                         axis: str = "rows"):
    """Numeric GENMF factorization with per-class node batches sharded
    blockwise over ``mesh``; fac feeds genmf_solve/dist_genmf_solve."""
    cache = _plan_fns(plan)
    key = ("fact", mesh, axis)
    fn = cache.get(key)
    if fn is None:
        shard = _node_shard(mesh, axis)
        fn = jax.jit(lambda d: genmf_factorize(plan, d, shard=shard))
        cache[key] = fn
    return fn(data)


def dist_genmf_solve(mesh: Mesh, plan: GenMfPlan, fac, b,
                     axis: str = "rows"):
    """Up/down substitution sweeps with the same node-axis sharding."""
    cache = _plan_fns(plan)
    key = ("solve", mesh, axis)
    fn = cache.get(key)
    if fn is None:
        shard = _node_shard(mesh, axis)
        fn = jax.jit(lambda f, v: genmf_solve(plan, f, v, shard=shard))
        cache[key] = fn
    return fn(fac, b)
