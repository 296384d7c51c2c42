"""Robertson stiff chemical kinetics via Radau5 with exact radau5.f
statistics (mirrors russell_ode/examples/robertson.rs and
tests/test_radau5_robertson.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.ode import Method, OdeSolver, Params, samples

system, x0, y0, args = samples.robertson()
params = Params(Method.RADAU5)
params.step.h_ini = 1e-6
params.set_tolerances(1e-8, 1e-2)
solver = OdeSolver(params, system)
y = solver.solve(y0, x0, 0.3, args=args)
st = solver.stats()
print(st.summary())
y = np.asarray(y)
# radau5.f oracle values + mass conservation y1+y2+y3 == 1
assert abs(float(y[0]) - 9.886740138499884e-01) < 1e-15
assert abs(float(y.sum()) - 1.0) < 1e-10
assert (st.n_function, st.n_jacobian, st.n_steps) == (88, 8, 17)
print("robertson final:", y)
print("ok")
