"""Brusselator PDE, SECOND-book variant (periodic BCs; mirrors
russell_ode/examples/brusselator_pde_radau5_2nd.rs at a demo npoint)."""
import _prelude  # noqa: F401
import numpy as np
import jax
from russell_tpu.ode import Method, OdeSolver, Params, samples

system, t0, y0, args = samples.brusselator_pde(0.1, 9, second_book=True)
params = Params(Method.RADAU5)
params.set_tolerances(1e-4, 1e-4)
solver = OdeSolver(params, system)
y = solver.solve(y0, t0, 1.0, args=None)
st = solver.stats()
assert bool(np.all(np.isfinite(np.asarray(y))))
print(f"ndim={2*9*9} steps={st.n_steps} accepted={st.n_accepted} "
      f"jacobians={st.n_jacobian} factorizations={st.n_factor}")
print("u center =", float(np.asarray(y)[4 * 9 + 4]))
print("brusselator pde 2nd book OK")
