"""Multi-host initialization + distributed BCR factorization wrapper.

SURVEY.md §5.8: the reference's one MPI-capable dependency is pinned to
sequential mode; the TPU-native replacement is ``jax.distributed`` for
multi-host process groups with collectives over ICI (intra-slice) and DCN
(across slices). ``shard_banded_factorize``/``shard_banded_solve`` place
the BCR block axis on a mesh so every reduction level runs data-parallel
and the neighbor shifts become collective-permutes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from russell_tpu.sparse import factor as _factor


def _plan_fns(plan) -> dict:
    """Per-plan jit cache attached to the plan object (an id(plan)-keyed
    module dict poisons a NEW plan when the GC recycles the id)."""
    st = getattr(plan, "_par_fns", None)
    if st is None:
        st = plan._par_fns = {}
    return st





__all__ = ["initialize_multihost", "shard_banded_factorize",
           "shard_banded_solve"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper (no-op when single-process or
    already initialized)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def _block_sharding(mesh: Mesh, axis: str):
    return NamedSharding(mesh, P(axis))


def shard_banded_factorize(mesh: Mesh, plan, data, axis: str = "rows"):
    """BANDED/BCR numeric factorization with the block axis sharded over the
    mesh — GSPMD partitions every level's batched LU/GEMM and inserts the
    collective-permutes for the neighbor shifts."""
    if not plan.use_bcr:
        raise ValueError("distributed factorization requires the BCR kernel "
                         "(analyze(..., banded_kernel='bcr'))")
    sh = _block_sharding(mesh, axis)
    cache = _plan_fns(plan)
    fn = cache.get("mh_fact")
    if fn is None:
        fn = jax.jit(lambda d: _factor.numeric_factorize(plan, d),
                     out_shardings=None)
        cache["mh_fact"] = fn
    with mesh:
        fac = fn(jnp.asarray(data))
    # place the level arrays on the mesh (block axis) for the solves
    nd = mesh.devices.size

    def place(v):
        # shard only when the block axis divides the mesh; else replicate
        if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] % nd == 0:
            return jax.device_put(v, _block_sharding(mesh, axis))
        return v

    placed = {}
    for key, val in fac.items():
        if key == "levels":
            placed[key] = [{k2: place(v2) for k2, v2 in lv.items()}
                           for lv in val]
        else:
            placed[key] = val
    return placed


def shard_banded_solve(mesh: Mesh, plan, fac, b, axis: str = "rows"):
    cache = _plan_fns(plan)
    fn = cache.get("mh_solve")
    if fn is None:
        fn = jax.jit(lambda f, bb: _factor.factor_solve(plan, f, bb))
        cache["mh_solve"] = fn
    with mesh:
        return fn(fac, b)
