"""Distributed GRIDMF: the regular-grid multifrontal factorization with
its congruent-node batch axis sharded over a device mesh.

The elimination tree of the padded grid is perfectly balanced, so every
depth is ONE batched GEMM pipeline over ``n_nodes = 2^d`` congruent
fronts — the natural data-parallel axis. Under BLOCKWISE sharding of the
node axis, the children ``2i, 2i+1`` of parent ``i`` live on the
parent's shard (a block ``[a, b)`` of parents maps to the child block
``[2a, 2b)``), so the extend-add stage is traffic-free; collectives
only appear at the top ``log2(n_devices)`` depths where ``n_nodes``
drops below the mesh size and XLA regroups/replicates the small fronts.
That is the subtree-ownership mapping of distributed multifrontal codes
(the MUMPS MPI layer's role — the reference pins it to sequential mode,
interface_mumps.c:153) expressed purely through sharding annotations:
XLA's SPMD partitioner inserts the collectives.

Math is IDENTICAL to the single-chip path — sharding constraints change
layout, never values, so there is no f32 delta-add poisoning hazard by
construction (results match ``gridmf_factorize`` bit for bit up to GEMM
reassociation inside a shard).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from russell_tpu.sparse.gridmf import (GridMfPlan, gridmf_factorize,
                                       gridmf_solve)


def _plan_fns(plan) -> dict:
    """Per-plan jit cache attached to the plan object (an id(plan)-keyed
    module dict poisons a NEW plan when the GC recycles the id)."""
    st = getattr(plan, "_par_fns", None)
    if st is None:
        st = plan._par_fns = {}
    return st

__all__ = ["dist_gridmf_factorize", "dist_gridmf_solve"]


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


# jitted wrappers keyed by (plan identity, mesh, axis): a fresh
# jax.jit(lambda ...) per call would recompile every invocation




def dist_gridmf_factorize(mesh: Mesh, plan: GridMfPlan, data,
                          axis: str = "rows"):
    """Numeric GRIDMF factorization with per-depth fronts sharded
    blockwise over ``mesh`` along the node axis. Returns the same fac
    pytree as ``gridmf_factorize`` (feeds ``gridmf_solve`` /
    ``dist_gridmf_solve``)."""
    cache = _plan_fns(plan)
    key = ("fact", mesh, axis)
    fn = cache.get(key)
    if fn is None:
        shard = _node_shard(mesh, axis)
        fn = jax.jit(lambda d: gridmf_factorize(plan, d, shard=shard))
        cache[key] = fn
    return fn(data)


def dist_gridmf_solve(mesh: Mesh, plan: GridMfPlan, fac, b,
                      axis: str = "rows"):
    """Up/down substitution sweeps with the same node-axis sharding."""
    cache = _plan_fns(plan)
    key = ("solve", mesh, axis)
    fn = cache.get(key)
    if fn is None:
        shard = _node_shard(mesh, axis)
        fn = jax.jit(lambda f, v: gridmf_solve(plan, f, v, shard=shard))
        cache[key] = fn
    return fn(fac, b)
