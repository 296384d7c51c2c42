"""Simplest possible ODE: y' = x + y with one equation, solved by DoPri8
and checked against the analytical solution
(mirrors russell_ode examples/simple_ode_single_equation.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import math
import jax.numpy as jnp
from russell_tpu.ode import Method, OdeSolver, Params, System

# y' = x + y,  y(0) = 0  =>  y = e^x - x - 1
system = System(1, lambda x, y, args: x + y)
params = Params(Method.DOPRI8)
solver = OdeSolver(params, system)
y = solver.solve(jnp.zeros(1), 0.0, 1.0)
st = solver.stats()
print(st.summary())
exact = math.e - 2.0
print(f"y(1) = {float(y[0]):.12f}, exact = {exact:.12f}")
assert abs(float(y[0]) - exact) < 1e-7
print("ok")
