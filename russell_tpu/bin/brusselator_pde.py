"""CLI benchmark driver: Brusselator PDE via Radau5.

Reference contract: russell_ode/src/bin/brusselator_pde.rs (structopt:
npoint / tol / second-book / no-dense-output, lines 9-50), producing the
run logs in russell_ode/data/logs/brus_pde_*.txt.

Usage:
    python -m russell_tpu.bin.brusselator_pde [--npoint 129] [--tol 1e-4] \
        [--tf 1.0] [--alpha 2e-3] [--second-book] [--fused/--no-fused]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--npoint", type=int, default=129)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--tf", type=float, default=1.0)
    ap.add_argument("--alpha", type=float, default=2e-3)
    ap.add_argument("--second-book", action="store_true")
    ap.add_argument("--no-fused", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import os as _os
    if _os.environ.get("JAX_PLATFORMS"):
        # the env var wins even where sitecustomize pinned a platform list
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    if jax.default_backend() != "cpu":
        # persistent cache for the minutes-long remote TPU compiles; OFF
        # on CPU (fast compiles, and cache writes of multi-device CPU
        # executables have segfaulted when tests run the CLIs in-process)
        _os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    import numpy as np
    from russell_tpu.ode import Method, OdeSolver, Params, samples

    system, t0, yy0, _ = samples.brusselator_pde(
        args.alpha, args.npoint, second_book=args.second_book)
    params = Params(Method.RADAU5)
    params.set_tolerances(args.tol, args.tol)
    solver = OdeSolver(params, system)

    t_start = time.perf_counter()
    y = solver.solve(yy0, t0, args.tf, args=None,
                     fused=not args.no_fused)
    jax.block_until_ready(y)
    wall = time.perf_counter() - t_start

    st = solver.stats()
    print(f"brusselator_pde: npoint={args.npoint} "
          f"ndim={system.ndim} jac_nnz={system.jac_nnz} "
          f"second_book={args.second_book}")
    print(st.summary())
    print(f"total wall time = {wall:.3f} s")
    print(f"y[0] = {float(np.asarray(y)[0]):.10e}")
    print(f"finite = {bool(np.all(np.isfinite(np.asarray(y))))}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
