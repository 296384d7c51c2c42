"""Arenstorf orbit (restricted three-body) with DoPri8, matching the
reference's Fortran oracle counters (mirrors russell_ode
examples/arenstorf_dopri8.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.ode import Method, OdeSolver, Params, samples

system, x0, y0, x1, args, y_ref = samples.arenstorf()
params = Params(Method.DOPRI8)
params.set_tolerances(1e-7, 1e-7)
solver = OdeSolver(params, system)
y = solver.solve(y0, x0, x1, args=args)
st = solver.stats()
print(st.summary())
yh = np.asarray(y)
print("y(end) =", yh)
# the orbit is periodic: y(end) ~ y(0)
assert abs(yh[0] - float(np.asarray(y0)[0])) < 2e-3
assert abs(yh[1] - float(np.asarray(y0)[1])) < 2e-3
print("ok")
