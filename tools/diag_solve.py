"""On-chip solve-latency diagnostic (VERDICT r4 item 2).

Factorizes one benchmark case, then decomposes the warm solve cost:
  - raw engine solve (one _solve_once dispatch)
  - one fused residual/backward-error kernel (_resid_w_j)
  - an eager replay of the adaptive refinement (counts rounds per tier)
  - the production jitted factor_solve

Usage: python tools/diag_solve.py laplacian_2d_317
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


def t(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(name: str) -> None:
    from tools.bench_matrix_market import CASES, _build, _grid_hint
    from russell_tpu.sparse import Genie, LinSolver, LinSolParams
    from russell_tpu.sparse import factor as F

    spec, genie = CASES[name][0], CASES[name][1]
    coo = _build(spec)
    solver = LinSolver(Genie.from_name(genie))
    t0 = time.perf_counter()
    solver.factorize(coo, LinSolParams(grid=_grid_hint(spec)))
    print(f"factorize cold: {time.perf_counter()-t0:.2f}s", flush=True)
    rhs = np.ones(coo.nrow)
    t0 = time.perf_counter()
    x = solver.solve(rhs)
    print(f"solve cold: {time.perf_counter()-t0:.2f}s", flush=True)

    plan, fac = solver.plan, solver.fac
    b = jnp.asarray(rhs)

    print(f"production solve warm: {t(lambda: solver.solve(rhs), 2):.3f}s",
          flush=True)

    with F._mm_prec(plan, "solve"):
        raw = jax.jit(lambda f, v: F._solve_once(plan, f, v))
        print(f"raw engine solve: {t(lambda: raw(fac, b)):.3f}s",
              flush=True)

    rows, cols = F._device_indices(plan)
    data, rs, cs = fac["data"], fac["rs"], fac["cs"]
    dtype = data.dtype
    rb = rs.astype(dtype) * b.astype(dtype)
    x0 = raw(fac, b).astype(dtype)
    denom = F._denom_j(plan.n, x0, data, rb, rs, cs, rows, cols)
    print(f"resid_w kernel: "
          f"{t(lambda: F._resid_w_j(plan.n, x0, denom, data, rb, rs, cs, rows, cols)):.4f}s",
          flush=True)

    # eager replay of the adaptive tiers with per-round telemetry
    with F._mm_prec(plan, "solve"):
        rdt = jnp.zeros((), dtype).real.dtype
        tol = 2.0 * float(jnp.finfo(rdt).eps)
        w_accept = float(max(300.0, 3.0 * np.sqrt(plan.n))
                         * jnp.finfo(rdt).eps)
        xx = x0
        resid, w = F._resid_w_j(plan.n, xx, denom, data, rb, rs, cs,
                                rows, cols)
        w = float(w)
        print(f"w0={w:.3e} tol={tol:.1e} w_accept={w_accept:.1e}",
              flush=True)
        w_prev, k = np.inf, 0
        t_ir = time.perf_counter()
        while k < 20 and w > tol and w < 0.5 * w_prev:
            xx = (xx + raw(fac, resid)).astype(dtype)
            w_prev = w
            resid, wd = F._resid_w_j(plan.n, xx, denom, data, rb, rs,
                                     cs, rows, cols)
            w = float(wd)
            k += 1
            print(f"  IR round {k}: w={w:.3e}", flush=True)
        print(f"plain IR: {k} rounds, {time.perf_counter()-t_ir:.3f}s, "
              f"symmetric={getattr(plan, 'symmetric_values', False)}",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
