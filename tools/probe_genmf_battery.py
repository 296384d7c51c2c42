"""One-process on-chip GENMF experiment battery at geometric_264k scale.

Order matters: cheap measurements first (cold stepped compile is ~30 min
on the remote tunnel and nothing persists between processes), the
whole-program compile attempt LAST (it may abort the server compiler —
kSublaneGather — or run very long; everything before is already
printed).

    python tools/probe_genmf_battery.py [n] 2>&1 | tee /tmp/battery.log
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 263743
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from russell_tpu.sparse import (Genie, LinSolParams, LinSolver,
                                    VerifyLinSys, samples)
    from russell_tpu.sparse import genmf as _genmf

    print(f"== battery n={n} cap="
          f"{os.environ.get('RUSSELL_TPU_GENMF_GROUP', '16')}", flush=True)
    coo = samples.irregular_geometric(n)
    solver = LinSolver(Genie.GENMF)
    t0 = time.perf_counter()
    solver.factorize(coo, LinSolParams())
    print(f"cold factorize: {time.perf_counter()-t0:.1f} s", flush=True)

    plan = solver.plan.genmf_plan
    # factor dtype (f32 under mixed precision), not the f64 refine dtype
    rdt = next(st["sir"].dtype for st in solver.fac["classes"]
               if st["sir"] is not None)
    data = solver.fac["data"].astype(rdt)

    # -- per-group warm timing of the cached factorize steps ----------
    steps = _genmf._step_cache[("factg", id(plan), str(rdt))]
    groups = list(_genmf._depth_groups(plan))
    uniq = _genmf._presum(plan, data)
    delta = (plan.pivot_epsilon * (1.0 + jnp.max(jnp.abs(data)))
             ).astype(rdt)
    jax.block_until_ready((uniq, delta))

    # one full warm pass first (re-populate schur inputs per group)
    schur = {}
    per_group = []
    for gi, group in enumerate(groups):
        step = steps[gi]
        srcs = [schur[link.src] for ci in group
                for link in plan.classes[ci].links]
        t0 = time.perf_counter()
        outs = step(uniq, delta, *srcs)
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) * 1e3
        for k, ci in enumerate(group):
            if plan.classes[ci].r:
                schur[ci] = outs[4 * k + 3]
        c0, c1 = plan.classes[group[0]], plan.classes[group[-1]]
        nn = sum(plan.classes[ci].n_nodes for ci in group)
        fl = sum(plan.classes[ci].n_nodes
                 * (2 * plan.classes[ci].e ** 3
                    + 2 * plan.classes[ci].r * plan.classes[ci].e ** 2
                    + 2 * plan.classes[ci].r ** 2 * plan.classes[ci].e)
                 for ci in group)
        per_group.append((gi, c0.depth, len(group), nn, c0.e, c1.e,
                          fl / 1e9, dt))
    print("gi depth ncls nnodes e0..e1 GF ms  (blocking per group)",
          flush=True)
    tot = 0.0
    for row in per_group:
        tot += row[-1]
        print("  g%02d d=%d ncls=%d nn=%d e=%d..%d %.2fGF %.1fms"
              % row, flush=True)
    print(f"sum of blocking per-group times: {tot:.0f} ms", flush=True)

    # -- LinSolver warm paths ----------------------------------------
    for r in range(3):
        t0 = time.perf_counter()
        solver.factorize(coo)
        print(f"LinSolver.factorize warm [{r}]: "
              f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
    rhs = np.ones(coo.nrow)
    t0 = time.perf_counter()
    x = solver.solve(rhs)
    print(f"cold solve: {time.perf_counter()-t0:.1f} s", flush=True)
    for r in range(3):
        t0 = time.perf_counter()
        x = solver.solve(rhs)
        print(f"LinSolver.solve warm [{r}]: "
              f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
    v = VerifyLinSys.from_system(coo, x, rhs)
    print(f"relative_error: {v.relative_error:.3e}", flush=True)

    bdev = jnp.asarray(rhs)
    for r in range(3):
        t0 = time.perf_counter()
        xs = _genmf.genmf_solve_steps(plan, solver.fac, bdev)
        jax.block_until_ready(xs)
        print(f"raw genmf_solve_steps warm [{r}]: "
              f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    # -- whole-program attempts (LAST: may abort the server) ----------
    print("== whole-program genmf_solve compile attempt", flush=True)
    try:
        t0 = time.perf_counter()
        fs = jax.jit(lambda f, b: _genmf.genmf_solve(plan, f, b))
        xw = fs(solver.fac, bdev)
        jax.block_until_ready(xw)
        print(f"whole solve cold: {time.perf_counter()-t0:.1f} s",
              flush=True)
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fs(solver.fac, bdev))
            print(f"whole solve warm [{r}]: "
                  f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
        print("max|whole-stepped|:",
              float(jnp.max(jnp.abs(xw - xs))), flush=True)
    except Exception as ex:
        print(f"WHOLE SOLVE FAILED: {type(ex).__name__}: "
              f"{str(ex)[:300]}", flush=True)

    print("== whole-program genmf_factorize compile attempt", flush=True)
    try:
        t0 = time.perf_counter()
        ff = jax.jit(lambda d: _genmf.genmf_factorize(plan, d))
        fac = ff(data)
        jax.block_until_ready(fac)
        print(f"whole factorize cold: {time.perf_counter()-t0:.1f} s",
              flush=True)
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(ff(data))
            print(f"whole factorize warm [{r}]: "
                  f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
    except Exception as ex:
        print(f"WHOLE FACTORIZE FAILED: {type(ex).__name__}: "
              f"{str(ex)[:300]}", flush=True)


if __name__ == "__main__":
    main()
