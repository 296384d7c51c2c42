"""ODE system with a mass matrix, solved by Radau5
(mirrors russell_ode examples/simple_system_with_mass.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import math
import numpy as np
from russell_tpu.ode import Method, OdeSolver, Params, samples

system, x0, y0, args, y_fn_x = samples.simple_system_with_mass_matrix()
params = Params(Method.RADAU5)
params.set_tolerances(1e-8, 1e-8)
solver = OdeSolver(params, system)
x1 = 20.0
y = solver.solve(y0, x0, x1, args=args)
st = solver.stats()
print(st.summary())
yh = np.asarray(y)
# analytic solution: y = (cos x, -sin x, ln(1+x))
expect = np.asarray(y_fn_x(x1, args))
err = np.max(np.abs(yh - expect))
print(f"y({x1}) = {yh}  max err = {err:.2e}")
assert err < 1e-6
print("ok")
