"""Stiff van der Pol via Radau5, matching radau5.f statistics exactly
(mirrors russell_ode tests/test_radau5_van_der_pol.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.ode import Method, OdeSolver, Params, samples

system, x0, y0, x1, args = samples.van_der_pol(1e-6, False)
params = Params(Method.RADAU5)
params.step.h_ini = 1e-6
solver = OdeSolver(params, system)
y = solver.solve(y0, x0, x1, fused=True)
st = solver.stats()
print(st.summary())
assert (st.n_function, st.n_jacobian, st.n_steps) == (2249, 162, 280)
assert abs(float(y[0]) - 1.706163410178079) < 1e-12
print("ok")
