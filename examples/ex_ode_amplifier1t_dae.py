"""One-transistor amplifier DAE (singular mass matrix) via Radau5,
matching the radau5.f counters and solution exactly
(mirrors russell_ode examples/amplifier1t_radau5.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.ode import Method, OdeSolver, Params, samples

system, x0, y0, args = samples.amplifier1t()
params = Params(Method.RADAU5)
params.step.h_ini = 1e-6
params.set_tolerances(1e-4, 1e-4)
solver = OdeSolver(params, system)
y = np.asarray(solver.solve(y0, x0, 0.05, args=args))
st = solver.stats()
print(st.summary())
print("y =", np.round(y, 9))
assert abs(y[0] - (-2.226517868073645e-02)) < 1e-10
assert abs(y[1] - 3.068700099735197e+00) < 1e-10
assert abs(y[4] - (-2.269179823457655e+00)) < 1e-7
assert (st.n_steps, st.n_accepted, st.n_rejected) == (166, 127, 6)
assert (st.n_function, st.n_jacobian) == (1511, 126)
print("ok")
