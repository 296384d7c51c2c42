"""On-chip GRIDMF solve-latency breakdown (VERDICT r4 item 3: 2d_317
warm solve must reach <= 0.2 s at 1e-16 accuracy; round-3 log shows
0.757 s).  Separates the raw device solve program from the adaptive
refinement wrapper and the host<->device rhs/x transfers.

    python tools/profile_gridmf_tpu.py [npoint]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def t(label, fn, reps=3):
    outs = None
    import jax
    for r in range(reps):
        t0 = time.perf_counter()
        outs = fn()
        jax.block_until_ready(outs)
        print(f"  {label} [{r}]: {(time.perf_counter()-t0)*1e3:.1f} ms",
              flush=True)
    return outs


def main():
    npoint = int(sys.argv[1]) if len(sys.argv) > 1 else 317
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from russell_tpu.sparse import (Genie, LinSolParams, LinSolver,
                                    VerifyLinSys, samples)
    from russell_tpu.sparse import factor as _factor
    from russell_tpu.sparse import gridmf as _gridmf

    coo = samples.laplacian_2d(npoint)
    print(f"n={coo.nrow} nnz={coo.nnz}", flush=True)
    solver = LinSolver(Genie.GRIDMF)
    t0 = time.perf_counter()
    solver.factorize(coo, LinSolParams(grid=(npoint, npoint, 1)))
    print(f"cold factorize: {time.perf_counter()-t0:.1f} s", flush=True)
    t("factorize warm", lambda: solver.factorize(coo))

    rhs = np.ones(coo.nrow)
    t0 = time.perf_counter()
    x = solver.solve(rhs)
    print(f"cold solve: {time.perf_counter()-t0:.1f} s", flush=True)
    t("LinSolver.solve warm", lambda: solver.solve(rhs))

    # raw single-pass device solve (no refinement)
    plan, fac = solver.plan, solver.fac
    bdev = jnp.asarray(rhs)
    raw = jax.jit(lambda f, b: _factor._solve_once(plan, f, b))
    t("raw _solve_once jit warm", lambda: raw(fac, bdev))
    fs1 = jax.jit(lambda f, b: _factor.factor_solve(plan, f, b,
                                                    refine_steps=1))
    t("factor_solve refine=1 jit warm", lambda: fs1(fac, bdev))
    fsa = jax.jit(lambda f, b: _factor.factor_solve(plan, f, b))
    t("factor_solve adaptive jit warm", lambda: fsa(fac, bdev))

    v = VerifyLinSys.from_system(coo, solver.solve(rhs), rhs)
    print(f"relative_error: {v.relative_error:.3e}", flush=True)


if __name__ == "__main__":
    main()
