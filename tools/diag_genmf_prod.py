"""On-chip A/B: raw GENMF stepped drivers vs the LinSolver production
path, same process, x64 on (the production regime). Explains where the
production path loses time vs tools/bench_genmf.py (VERDICT r4 item 1).

    python tools/diag_genmf_prod.py [n] [leaf]
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


def t3(label, fn):
    out = jax.block_until_ready(fn())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    print(f"{label}: {min(times):.4f}s (x3: "
          f"{', '.join(f'{x:.3f}' for x in times)})", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 263743
    leaf = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    from russell_tpu.sparse import (Genie, LinSolver, LinSolParams,
                                    samples, genmf)
    from russell_tpu.sparse import factor as F

    coo = samples.irregular_geometric(n)
    ii = np.asarray(coo.indices_i[:coo.nnz])
    jj = np.asarray(coo.indices_j[:coo.nnz])
    vv = np.asarray(coo.values[:coo.nnz])

    t0 = time.perf_counter()
    gplan = genmf.genmf_analyze(n, ii, jj, leaf_target=leaf)
    print(f"analyze: {time.perf_counter()-t0:.1f}s "
          f"classes={len(gplan.classes)}", flush=True)

    vals32 = jnp.asarray(vv.astype(np.float32))
    b32 = jnp.asarray(np.ones(n, np.float32))

    fac_raw = t3("raw stepped fact", lambda: genmf.genmf_factorize_steps(
        gplan, vals32))
    t3("raw stepped solve", lambda: genmf.genmf_solve_steps(
        gplan, fac_raw, b32))

    # production
    os.environ["RUSSELL_TPU_GENMF_LEAF"] = str(leaf)
    solver = LinSolver(Genie.GENMF)
    t0 = time.perf_counter()
    solver.factorize(coo, LinSolParams())
    print(f"production factorize cold: {time.perf_counter()-t0:.2f}s",
          flush=True)
    t3("production factorize", lambda: (
        solver.factorize(coo), solver.fac["logdet"])[1])

    plan, fac = solver.plan, solver.fac
    with F._mm_prec(plan, "solve"):
        b64 = jnp.asarray(np.ones(n))
        t3("production _solve_once", lambda: F._solve_once(plan, fac,
                                                           b64))
        # eager adaptive replay with telemetry
        rows, cols = F._device_indices(plan)
        data, rs, cs = fac["data"], fac["rs"], fac["cs"]
        dtype = data.dtype
        rb = rs.astype(dtype) * b64.astype(dtype)
        x = F._solve_once(plan, fac, b64).astype(dtype)
        denom = F._denom_j(plan.n, x, data, rb, rs, cs, rows, cols)
        rdt = jnp.zeros((), dtype).real.dtype
        w_accept = float(max(300.0, 3.0 * np.sqrt(plan.n))
                         * jnp.finfo(rdt).eps)
        resid, w = F._resid_w_j(plan.n, x, denom, data, rb, rs, cs,
                                rows, cols)
        w = float(w)
        print(f"w0={w:.3e} w_accept={w_accept:.1e} "
              f"symmetric={getattr(plan, 'symmetric_values', None)}",
              flush=True)
        for k in range(6):
            t0 = time.perf_counter()
            x = (x + F._solve_once(plan, fac, resid)).astype(dtype)
            resid, wd = F._resid_w_j(plan.n, x, denom, data, rb, rs, cs,
                                     rows, cols)
            jax.block_until_ready(wd)
            w2 = float(wd)
            print(f"  IR round {k+1}: w={w2:.3e} gain={w/max(w2,1e-300):.1f}x "
                  f"({time.perf_counter()-t0:.3f}s)", flush=True)
            w = w2

    t0 = time.perf_counter()
    x = solver.solve(np.ones(n))
    print(f"production solve (full adaptive): "
          f"{time.perf_counter()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
