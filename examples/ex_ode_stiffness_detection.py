"""Stiffness detection: DoPri5 on a stiffening van der Pol raises a
StiffnessError (HW-II Eq. 2.26 ratio test), and Radau5 then solves the
same problem without complaint
(mirrors russell_ode examples/van_der_pol_dopri5_stiffness.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.ode import (Method, OdeSolver, Params, StiffnessError,
                             samples)

system, x0, y0, x1, args = samples.van_der_pol(0.003, False)

# explicit DoPri5: the stiffness monitor must fire
params = Params(Method.DOPRI5)
params.set_tolerances(1e-5, 1e-5)
params.stiffness.enabled = True
solver = OdeSolver(params, system)
try:
    solver.solve(y0, x0, 2.0, args=args)
    raise SystemExit("expected StiffnessError")
except StiffnessError as e:
    print(f"DoPri5 detected stiffness as expected: {e}")

# implicit Radau5 handles it
params2 = Params(Method.RADAU5)
params2.set_tolerances(1e-5, 1e-5)
solver2 = OdeSolver(params2, system)
y = solver2.solve(y0, x0, 2.0, args=args)
st = solver2.stats()
print(f"Radau5: y(2.0) = {np.asarray(y)}  steps = {st.n_steps} "
      f"(accepted {st.n_accepted})")
assert np.all(np.isfinite(np.asarray(y)))
assert st.n_steps < 1000
print("ok")
