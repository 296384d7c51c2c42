"""End-to-end GENMF through the NEW whole-program-with-fallback path.

    python tools/probe_genmf_whole.py [n]
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
    jax.config.update("jax_enable_x64", True)
    from russell_tpu.sparse import (Genie, LinSolParams, LinSolver,
                                    VerifyLinSys, samples)

    print(f"== whole-program probe n={n} "
          f"(RUSSELL_TPU_GENMF_WHOLE="
          f"{os.environ.get('RUSSELL_TPU_GENMF_WHOLE', '1')})", flush=True)
    coo = samples.irregular_geometric(n)
    solver = LinSolver(Genie.GENMF)
    t0 = time.perf_counter()
    solver.factorize(coo, LinSolParams())
    print(f"cold factorize: {time.perf_counter()-t0:.1f} s", flush=True)
    for r in range(3):
        t0 = time.perf_counter()
        solver.factorize(coo)
        print(f"factorize warm [{r}]: "
              f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
    rhs = np.ones(coo.nrow)
    t0 = time.perf_counter()
    x = solver.solve(rhs)
    print(f"cold solve: {time.perf_counter()-t0:.1f} s", flush=True)
    for r in range(3):
        t0 = time.perf_counter()
        x = solver.solve(rhs)
        print(f"solve warm [{r}]: "
              f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
    v = VerifyLinSys.from_system(coo, x, rhs)
    print(f"relative_error: {v.relative_error:.3e}", flush=True)
    st = solver.stats
    print(f"min_pivot={st.output['min_pivot']:.4f}", flush=True)


if __name__ == "__main__":
    main()
