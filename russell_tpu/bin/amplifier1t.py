"""CLI driver: one-transistor amplifier DAE via Radau5.

Reference contract: russell_ode/src/bin/amplifier1t.rs — solves the
singular-mass DAE of samples.amplifier1t and prints the radau5 stats
(oracle log: russell_ode/data/logs/fortran_radau5_amplifier1t.txt).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--tf", type=float, default=0.05)
    ap.add_argument("--h-out", type=float, default=0.001)
    args = ap.parse_args(argv)

    import jax
    import os as _os
    if _os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    if jax.default_backend() != "tpu":
        jax.config.update("jax_enable_x64", True)
    import numpy as np
    from russell_tpu.ode import Method, OdeSolver, Output, Params, samples

    system, x0, y0, _ = samples.amplifier1t()
    params = Params(Method.RADAU5)
    params.set_tolerances(args.tol, args.tol)
    params.step.h_ini = 1e-6
    solver = OdeSolver(params, system)
    out = Output().set_dense_h_out(args.h_out).set_dense_recording([0, 4])

    t_start = time.perf_counter()
    y = solver.solve(y0, x0, args.tf, args=None, output=out)
    wall = time.perf_counter() - t_start

    print(solver.stats().summary())
    print(f"total wall time = {wall:.3f} s")
    yv = np.asarray(y)
    for i, v in enumerate(yv):
        print(f"y[{i}] = {v:.10e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
