"""Brusselator PDE solver-backend comparison (mirrors
russell_ode/examples/brusselator_pde_2nd_comparison.rs: same problem
through different linear-solver genies; solutions and step counters
must agree)."""
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.ode import Method, OdeSolver, Params, samples
from russell_tpu.sparse.enums import Genie

results = {}
for genie in (Genie.BANDED, Genie.SPLU):
    system, t0, y0, args = samples.brusselator_pde(2e-3, 9)
    params = Params(Method.RADAU5)
    params.set_tolerances(1e-4, 1e-4)
    params.newton.genie = genie
    solver = OdeSolver(params, system)
    y = solver.solve(y0, t0, 1.0, args=None)
    st = solver.stats()
    results[genie.value] = (np.asarray(y), st.n_steps, st.n_accepted)
    print(f"{genie.value:>8}: n_steps={st.n_steps} "
          f"n_accepted={st.n_accepted} y[0]={float(np.asarray(y)[0]):.8f}")
ys = list(results.values())
assert ys[0][1] == ys[1][1], "step counters must match across genies"
assert np.max(np.abs(ys[0][0] - ys[1][0])) < 1e-8
print("backend comparison OK")
