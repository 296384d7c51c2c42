"""On-chip GENMF latency breakdown at geometric_264k scale.

Answers: where do the 4.1 s warm factorize / 101 s warm solve go
(VERDICT r4: Raj1 reference bar is 81.8 ms factorize / 15.9 ms solve)?
Separates host->device data transfer, raw stepped-driver time, and the
LinSolver adaptive-refinement overhead.

    RUSSELL_TPU_GENMF_GROUP=16 python tools/profile_genmf_tpu.py [n]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def t(label, fn, reps=1):
    outs = None
    for r in range(reps):
        t0 = time.perf_counter()
        outs = fn()
        import jax
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        print(f"  {label} [{r}]: {dt*1e3:.1f} ms", flush=True)
    return outs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 263743
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from russell_tpu.sparse import (Genie, LinSolParams, LinSolver,
                                    samples)
    from russell_tpu.sparse import genmf as _genmf

    print(f"devices: {jax.devices()}  group cap: "
          f"{os.environ.get('RUSSELL_TPU_GENMF_GROUP', '16')}", flush=True)
    t0 = time.perf_counter()
    coo = samples.irregular_geometric(n)
    print(f"build: {time.perf_counter()-t0:.1f} s  n={coo.nrow} "
          f"nnz={coo.nnz}", flush=True)

    vals = np.asarray(coo.values[:coo.nnz])
    t("ship values f64", lambda: jnp.asarray(vals), reps=2)
    t("ship values f32", lambda: jnp.asarray(vals.astype(np.float32)),
      reps=2)

    solver = LinSolver(Genie.GENMF)
    t0 = time.perf_counter()
    solver.factorize(coo, LinSolParams())
    print(f"cold factorize (incl analyze+compile): "
          f"{time.perf_counter()-t0:.1f} s", flush=True)
    t("LinSolver.factorize warm", lambda: solver.factorize(coo),
      reps=3)

    plan = solver.plan.genmf_plan
    dscaled = solver.fac["data"]
    ngroups = len(list(_genmf._depth_groups(plan)))
    print(f"  classes={len(plan.classes)} groups={ngroups}", flush=True)
    t("raw genmf_factorize_steps (device data)",
      lambda: _genmf.genmf_factorize_steps(plan, dscaled), reps=3)

    rhs = np.ones(coo.nrow)
    t0 = time.perf_counter()
    x = solver.solve(rhs)
    jax.block_until_ready(x)
    print(f"cold solve: {time.perf_counter()-t0:.1f} s", flush=True)
    t("LinSolver.solve warm", lambda: solver.solve(rhs), reps=3)

    bdev = jnp.asarray(rhs)
    t("raw genmf_solve_steps (device rhs)",
      lambda: _genmf.genmf_solve_steps(plan, solver.fac, bdev), reps=3)

    from russell_tpu.sparse import VerifyLinSys
    v = VerifyLinSys.from_system(coo, solver.solve(rhs), rhs)
    print(f"relative_error: {v.relative_error:.3e}", flush=True)


if __name__ == "__main__":
    main()
