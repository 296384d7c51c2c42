"""Brusselator ODE with variable-step DoPri8 vs fixed-step RK4
(mirrors russell_ode/examples/brusselator_ode_var_step.rs and
brusselator_ode_fix_step.rs; y_ref from Mathematica)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.ode import Method, OdeSolver, Params, samples

system, x0, y0, args, y_ref = samples.brusselator_ode()

# variable step: embedded error control picks the step sizes
params = Params(Method.DOPRI8)
params.set_tolerances(1e-8, 1e-8)
sol = OdeSolver(params, system)
y = np.asarray(sol.solve(y0, x0, 20.0, args=args))
st = sol.stats()
print("DoPri8 var-step:", y, "n_steps:", st.n_steps)
assert np.max(np.abs(y - y_ref)) < 1e-7

# fixed step: the classic RK4 with h chosen by the user
params2 = Params(Method.RK4)
sol2 = OdeSolver(params2, system)
y2 = np.asarray(sol2.solve(y0, x0, 20.0, args=args, h_equal=0.002))
print("RK4 fixed-step:", y2, "n_steps:", sol2.stats().n_steps)
assert np.max(np.abs(y2 - y_ref)) < 1e-7
print("ok")
