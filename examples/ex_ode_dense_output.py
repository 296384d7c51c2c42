"""DoPri5 with dense output at fixed stations (mirrors
russell_ode examples/simple_ode_single_equation.rs + dense output)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import math
from russell_tpu.ode import Method, OdeSolver, Output, Params, samples

system, x0, y0, args, y_fn = samples.hairer_wanner_eq1()
solver = OdeSolver(Params(Method.DOPRI5), system)
out = Output().set_dense_h_out(0.1).set_dense_recording([0])
solver.solve(y0, x0, 1.5, args=args, output=out)
for x, y in zip(out.dense_x(), out.dense_y(0)):
    print(f"x = {x:4.1f}  y = {y:20.12e}  err = {abs(y - y_fn(x, None)[0]):.1e}")
    assert abs(y - y_fn(x, None)[0]) < 1e-4
print("ok")
