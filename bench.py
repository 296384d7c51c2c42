"""Headline benchmark: Brusselator PDE solved by Radau5 with the native
banded block-LU — the reference's flagship workload
(russell_ode/data/logs/brus_pde_1st_mumps_24.txt: npoint=513, tol 1e-4,
total 122.2 s with MUMPS on a 24-thread MKL host).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference's cost is dominated by sparse factorization; its throughput
on this workload is (31 factorizations x 3.68 Mnnz) / 122.2 s. We report
our end-to-end solve time and compare per-factorization throughput scaled
to the benchmark npoint (configurable: BENCH_NPOINT, BENCH_TF).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _wait_for_chip(max_tries: int = 12) -> None:
    """The attached TPU worker sometimes restarts for minutes; a client
    that connects while it is down hangs forever. Probe from SUBPROCESSES
    (killable) until a trivial computation succeeds. If the worker never
    comes back, print the one honest-failure JSON line and exit — the
    main process would otherwise hang forever inside backend init."""
    import subprocess
    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.sum(jnp.ones(4))))")
    for _ in range(max_tries):
        try:
            out = subprocess.run([sys.executable, "-c", probe],
                                 capture_output=True, timeout=90)
            if out.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        time.sleep(60)
    print(json.dumps({
        "metric": "brusselator_pde_radau5_FAILED_tpu_worker_down",
        "value": -1.0, "unit": "s", "vs_baseline": 0.0}))
    sys.exit(0)


def main() -> None:
    _wait_for_chip()
    import jax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if os.environ.get("BENCH_X64", "0") == "1":
        jax.config.update("jax_enable_x64", True)
    from russell_tpu.ode import Method, OdeSolver, Params, samples

    # default = the reference's headline scale (npoint=513, ndim=526,338,
    # brus_pde_1st_mumps_24.txt). Measured 2026-08-19 on the attached
    # TPU v5e: cold compile 1923 s (one-time, server-side), warm 85.8 s
    # vs the reference's 122.2 s full-horizon wall -> vs_baseline 1.24
    # at MATCHED scale. Set BENCH_NPOINT=129 for a quick (~5 min) run.
    npoint = int(os.environ.get("BENCH_NPOINT", "513"))
    tf = float(os.environ.get("BENCH_TF", "1.0"))
    alpha = 2e-3

    system, t0, yy0, args = samples.brusselator_pde(alpha, npoint)
    params = Params(Method.RADAU5)
    params.set_tolerances(1e-4, 1e-4)
    genie_env = os.environ.get("BENCH_GENIE")
    if genie_env:
        from russell_tpu.sparse.enums import Genie
        params.newton.genie = Genie[genie_env.upper()]

    solver = OdeSolver(params, system)
    t_start = time.perf_counter()
    try:
        y = solver.solve(yy0, t0, tf, args=None, fused=True)
        jax.block_until_ready(y)
        cold = time.perf_counter() - t_start
        # warm run: pure device execution (the production steady state;
        # the first call pays the one-time XLA compile, which on the
        # remote-tunnel dev chip dominates)
        t_start = time.perf_counter()
        y = solver.solve(yy0, t0, tf, args=None, fused=True)
        jax.block_until_ready(y)
        wall = time.perf_counter() - t_start
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({
            "metric": f"brusselator_pde_radau5_npoint{npoint}_FAILED_"
                      f"{type(exc).__name__}",
            "value": -1.0, "unit": "s", "vs_baseline": 0.0}))
        return
    st = solver.stats()

    ndim = 2 * npoint * npoint
    jac_nnz = system.jac_nnz

    # reference throughput on its own hardware: 31 factorizations of a
    # 3.68M-nnz Jacobian within 122.2 s total (MUMPS, 24 threads)
    ref_fact_nnz_per_s = 31 * 3.68e6 / 122.2
    ours_fact_nnz_per_s = st.n_factor * jac_nnz / wall

    ok = bool(np.all(np.isfinite(np.asarray(y))))
    print(json.dumps({
        "metric": (f"brusselator_pde_radau5_npoint{npoint}_tf{tf}"
                   f"_ndim{ndim}_nsteps{st.n_steps}_nfactor{st.n_factor}"
                   f"_finite{ok}_cold{round(cold, 1)}s"),
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(ours_fact_nnz_per_s / ref_fact_nnz_per_s, 3),
    }))


if __name__ == "__main__":
    main()
