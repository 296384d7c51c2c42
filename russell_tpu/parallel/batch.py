"""Data-parallel batched factorize/solve across the mesh.

The reference proves solver thread-safety by running many independent
solvers under rayon (russell_ode/tests/test_multithreaded.rs:1-50, P6 in
SURVEY.md §2.9). The TPU-native equivalent: vmap the numeric factorization
over a batch of matrices with identical structure, and shard the batch axis
over the mesh — every chip factorizes its slice concurrently, no
communication at all (embarrassingly parallel over ICI-free work).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from russell_tpu.sparse import factor as _factor


def _plan_fns(plan) -> dict:
    """Per-plan jit cache attached to the plan object (an id(plan)-keyed
    module dict poisons a NEW plan when the GC recycles the id)."""
    st = getattr(plan, "_par_fns", None)
    if st is None:
        st = plan._par_fns = {}
    return st


__all__ = ["batch_factor_solve"]

# per-plan jit caches live on the plan object (_plan_fns)


def batch_factor_solve(mesh: Mesh, plan, batch_vals, batch_rhs, axis: str = "rows"):
    """Solve A_i x_i = b_i for a batch of same-structure systems.

    ``batch_vals``: (B, nnz) entry values, ``batch_rhs``: (B, n); the batch
    axis is sharded over ``mesh`` axis ``axis``. Returns (B, n) solutions.
    """
    cache = _plan_fns(plan)
    key = ("batch", mesh, axis)
    fn = cache.get(key)
    if fn is None:
        sharding = NamedSharding(mesh, P(axis))

        def one(vals, rhs):
            fac = _factor.numeric_factorize(plan, vals)
            return _factor.factor_solve(plan, fac, rhs)

        fn = jax.jit(jax.vmap(one),
                     in_shardings=(sharding, sharding),
                     out_shardings=sharding)
        cache[key] = fn
    return fn(batch_vals, batch_rhs)
