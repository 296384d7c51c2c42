"""GRIDMF TPU microbenchmark: times the Radau5-relevant pieces on the
Brusselator PDE Jacobian structure (the headline workload's hot path):

- real factorize of K_real = gamma*I - J        (1 plane)
- complex factorize of K_comp = (a+bi)*I - J    (2 planes)
- one solve through each factorization

for a sweep of npoint / leaf_cells configurations. Each configuration
runs in its OWN SUBPROCESS with a hard timeout: the attached TPU worker
kills long device calls and takes 15-40 min to recover from a crash, so
a bad configuration must never take the sweep down with it.

Usage:
    python tools/bench_gridmf.py                      # default sweep
    python tools/bench_gridmf.py --npoint 257 --leaf 16   # one config (worker)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_one(npoint: int, leaf: int, cpu: bool = False) -> None:
    import numpy as np
    import jax

    if cpu:  # sitecustomize pins the axon TPU; re-pin via jax.config
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from russell_tpu.ode import samples
    from russell_tpu.sparse import gridmf

    system, _t0, y0, _args = samples.brusselator_pde(2e-3, npoint)
    ii, jj = system.jac_structure
    n = system.ndim
    t = time.perf_counter()
    plan = gridmf.gridmf_analyze(n, np.asarray(ii), np.asarray(jj),
                                 system.grid, leaf_cells=leaf)
    t_analyze = time.perf_counter() - t

    store = sum(lv.n_nodes * (lv.e * lv.e + 2 * lv.r * lv.e)
                for lv in plan.levels)

    # Jacobian values at y0 plus the Radau5 shifts (gamma/h ~ 3.6 at h=1e-3)
    (_ii, _jj), jac_fn = system.jac_values_fn()
    jv = np.asarray(jac_fn(0.0, jnp.asarray(y0), None))
    diag = np.asarray(ii) == np.asarray(jj)
    kr = jnp.asarray((3637.0 * diag - jv).astype(np.float32))
    # complex64 HOST<->DEVICE transfers are UNIMPLEMENTED on the axon
    # backend (both directions): ship the real/imag planes as f32 and
    # combine on device inside the jit (the production Radau5 path does
    # the same — the shifted complex matrix only ever exists in-trace).
    kc_re = jnp.asarray((2681.0 * diag - jv).astype(np.float32))
    kc_im = jnp.asarray((3050.0 * diag).astype(np.float32))
    b = jnp.asarray(np.linspace(1.0, 2.0, n).astype(np.float32))

    fact = jax.jit(lambda d: gridmf.gridmf_factorize(plan, d))
    factc = jax.jit(lambda re, im: gridmf.gridmf_factorize(
        plan, jax.lax.complex(re, im)))
    solve = jax.jit(lambda f, v: gridmf.gridmf_solve(plan, f, v))

    t = time.perf_counter()
    fr = jax.block_until_ready(fact(kr))
    cold_r = time.perf_counter() - t
    t = time.perf_counter()
    fr = jax.block_until_ready(fact(kr))
    warm_r = time.perf_counter() - t

    t = time.perf_counter()
    xr = jax.block_until_ready(solve(fr, b))
    cold_sol = time.perf_counter() - t
    t = time.perf_counter()
    xr = jax.block_until_ready(solve(fr, b))
    warm_sol = time.perf_counter() - t

    t = time.perf_counter()
    fc = jax.block_until_ready(factc(kc_re, kc_im))
    cold_c = time.perf_counter() - t
    t = time.perf_counter()
    fc = jax.block_until_ready(factc(kc_re, kc_im))
    warm_c = time.perf_counter() - t
    del fc

    # f32 residual sanity (no refinement here; factor.py adds it)
    r = (jnp.zeros(n, jnp.float32)
         .at[jnp.asarray(ii)].add(kr * xr[jnp.asarray(jj)])) - b
    resid = float(jnp.max(jnp.abs(r)))

    print(json.dumps({
        "npoint": npoint, "leaf": leaf, "n": n,
        "levels": len(plan.levels),
        "store_gb_per_plane": round(store * 4 / 2**30, 3),
        "t_analyze_s": round(t_analyze, 2),
        "fact_real_cold_s": round(cold_r, 3),
        "fact_real_warm_s": round(warm_r, 4),
        "fact_complex_cold_s": round(cold_c, 3),
        "fact_complex_warm_s": round(warm_c, 4),
        "solve_cold_s": round(cold_sol, 3),
        "solve_warm_s": round(warm_sol, 4),
        "resid_f32": resid,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--npoint", type=int)
    ap.add_argument("--leaf", type=int)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.npoint:
        run_one(args.npoint, args.leaf or 64, cpu=args.cpu)
        return

    sweep = [(129, 16), (129, 64), (257, 16), (257, 64),
             (513, 16), (513, 64)]
    for npoint, leaf in sweep:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--npoint", str(npoint), "--leaf", str(leaf)]
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=args.timeout)
            tail = (out.stdout.strip().splitlines() or ["(no output)"])[-1]
            print(tail if out.returncode == 0 else
                  json.dumps({"npoint": npoint, "leaf": leaf,
                              "error": (out.stderr or "?").strip()[-300:]}))
        except subprocess.TimeoutExpired:
            print(json.dumps({"npoint": npoint, "leaf": leaf,
                              "error": "timeout"}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
