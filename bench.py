"""Headline benchmark: native banded-LU factorization throughput on the
Brusselator-PDE-class Jacobian structure (2-D 5-point operator).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's Brusselator-PDE npoint=513 run has
3.68M-nnz Jacobians whose MUMPS factorization takes 21.91 s on a 24-thread
MKL host (russell_ode/data/logs/brus_pde_1st_mumps_24.txt) —
i.e. ~0.168 Mnnz/s of factorization throughput. We report our factorization
throughput in Mnnz/s on the same structure class; vs_baseline is the ratio
(>1 means faster than the reference's backend).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_MNNZ_PER_S = 3.68e6 / 21.91 / 1e6  # MUMPS on brusselator npoint=513


def main() -> None:
    import jax
    import jax.numpy as jnp
    from russell_tpu.sparse import samples
    from russell_tpu.sparse import factor as _factor
    from russell_tpu.sparse.enums import Genie

    npoint = int(os.environ.get("BENCH_NPOINT", "129"))
    coo = samples.laplacian_2d(npoint)
    ii, jj, vv = coo.triplets()
    nnz = coo.nnz
    plan = _factor.analyze(coo.nrow, ii, jj, genie=Genie.BANDED)
    dtype = jnp.float32
    vals = jnp.asarray(vv, dtype=dtype)
    rhs = jnp.asarray(np.linspace(1.0, 2.0, coo.nrow), dtype=dtype)

    fact = jax.jit(lambda v: _factor.numeric_factorize(plan, v))
    solve = jax.jit(lambda f, b: _factor.factor_solve(plan, f, b))

    fac = fact(vals)  # compile + warm up
    jax.block_until_ready(fac)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        fac = fact(vals)
    jax.block_until_ready(fac)
    dt = (time.perf_counter() - t0) / reps

    x = solve(fac, rhs)
    jax.block_until_ready(x)

    # residual check (scaled relative error, VerifyLinSys-style)
    xs = np.asarray(x, dtype=np.float64)
    iif, jjf, vvf = np.asarray(ii), np.asarray(jj), np.asarray(vv)
    ax = np.zeros(coo.nrow)
    np.add.at(ax, iif, vvf * xs[jjf])
    rel_err = float(np.max(np.abs(ax - np.asarray(rhs, dtype=np.float64)))
                    / (np.max(np.abs(vvf)) + 1.0))

    mnnz_per_s = nnz / dt / 1e6
    print(json.dumps({
        "metric": f"banded_lu_factorize_throughput_n{coo.nrow}_nnz{nnz}"
                  f"_relerr{rel_err:.1e}",
        "value": round(mnnz_per_s, 3),
        "unit": "Mnnz/s",
        "vs_baseline": round(mnnz_per_s / BASELINE_MNNZ_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
