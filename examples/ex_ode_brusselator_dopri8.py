"""Brusselator ODE with DoPri8 dense output, compared against the
reference's Mathematica solution at tf = 20
(mirrors russell_ode examples/brusselator_ode_dopri8.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.ode import Method, OdeSolver, Output, Params, samples

system, x0, y0, args, y_ref = samples.brusselator_ode()
params = Params(Method.DOPRI8)
params.set_tolerances(1e-8, 1e-8)
solver = OdeSolver(params, system)
out = Output().set_dense_h_out(1.0).set_dense_recording([0, 1])
y = solver.solve(y0, x0, 20.0, args=args, output=out)
st = solver.stats()
print(st.summary())
print(f"y(20) = ({float(y[0]):.10f}, {float(y[1]):.10f})")
print(f"ref   = ({y_ref[0]:.10f}, {y_ref[1]:.10f})")
assert np.allclose(np.asarray(y), np.asarray(y_ref), atol=1e-7)
# the dense output must bracket the final state consistently
assert len(out.dense_x()) == len(out.dense_y(0)) == 21
print("ok")
