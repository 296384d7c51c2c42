"""Phase-level timing of the production geometric_264k flow (one
process, x64): isolates upload / prep / steps / syncs / solve tiers.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_enable_x64", True)
os.makedirs(os.path.join(ROOT, ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

P = lambda *a: print(*a, flush=True)


def main():
    from russell_tpu.sparse import Genie, LinSolver, LinSolParams, samples
    from russell_tpu.sparse import factor as F

    coo = samples.irregular_geometric(263743)
    solver = LinSolver(Genie.GENMF)
    t0 = time.perf_counter()
    solver.factorize(coo, LinSolParams())
    P(f"factorize cold total: {time.perf_counter()-t0:.1f}s")
    rhs = np.ones(coo.nrow)
    t0 = time.perf_counter()
    solver.solve(rhs)
    P(f"solve cold total: {time.perf_counter()-t0:.1f}s")

    plan, fac = solver.plan, solver.fac
    ii, jj, vv = coo.triplets()

    def t3(label, fn, n=3):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        P(f"{label}: {min(ts):.4f}s (x{n}: "
          + ", ".join(f"{x:.3f}" for x in ts) + ")")

    # factorize phases
    t3("upload vals f64", lambda: F.as_device(vv).block_until_ready())
    vals = F.as_device(vv)
    prep = plan._genmf_prep[str(jnp.asarray(vals).dtype)]
    t3("prep jit", lambda: jax.block_until_ready(prep(vals)))
    data, d, rs, cs = prep(vals)
    from russell_tpu.sparse import genmf as G
    t3("steps exec", lambda: jax.block_until_ready(
        G.genmf_factorize_steps(plan.genmf_plan, d)))
    t3("full LinSolver.factorize",
       lambda: solver.factorize(coo), n=2)

    # solve phases
    b64 = jnp.asarray(rhs)
    with F._mm_prec(plan, "solve"):
        t3("_solve_once (whole?)",
           lambda: F._solve_once(plan, fac, b64).block_until_ready())
        fn = F._genmf_refine_whole(plan, b64.dtype)
        P(f"refine_whole available: {fn is not None}")
        if fn is not None:
            t0 = time.perf_counter()
            xw = jax.block_until_ready(fn(fac, b64))
            P(f"refine_whole cold: {time.perf_counter()-t0:.2f}s "
              f"w={float(xw[1]):.3e}")
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                xw = jax.block_until_ready(fn(fac, b64))
                ts.append(time.perf_counter() - t0)
            P(f"refine_whole warm: {min(ts):.4f}s (x3: "
              + ", ".join(f"{x:.3f}" for x in ts) + ")")
        rows, cols = F._device_indices(plan)
        dt = fac["data"].dtype
        rb = rs.astype(dt) * b64.astype(dt)
        x0 = F._solve_once(plan, fac, b64).astype(dt)
        denom = F._denom_j(plan.n, x0, fac["data"], rb, rs, cs, rows,
                           cols)
        resid, w = F._resid_w_j(plan.n, x0, denom, fac["data"], rb, rs,
                                cs, rows, cols)
        P(f"w0={float(w):.3e}")
        x = x0
        for k in range(5):
            t0 = time.perf_counter()
            x = (x + F._solve_once(plan, fac, resid)).astype(dt)
            resid, wd = F._resid_w_j(plan.n, x, denom, fac["data"], rb,
                                     rs, cs, rows, cols)
            wv = float(wd)
            P(f"  IR {k+1}: w={wv:.3e} ({time.perf_counter()-t0:.3f}s)")
    t3("full LinSolver.solve", lambda: solver.solve(rhs), n=2)


if __name__ == "__main__":
    main()
