"""Newton-Raphson on a 2-equation system, analytic vs numerical Jacobian
(mirrors russell_lab examples/algo_newton_solver.rs +
algo_numerical_jacobian.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
import jax.numpy as jnp
from russell_tpu.algo import NewtonSolver, num_jacobian

# intersect circle x^2+y^2=4 with hyperbola xy=1
def residual(x, u, args):
    return jnp.array([u[0] ** 2 + u[1] ** 2 - 4.0, u[0] * u[1] - 1.0])

def jacobian(x, u, args):
    return jnp.array([[2.0 * u[0], 2.0 * u[1]], [u[1], u[0]]])

# check the numerical Jacobian against the analytic one first
u0 = np.array([2.0, 0.5])
J_num = np.asarray(num_jacobian(residual, 0.0, u0, None))
J_ana = np.asarray(jacobian(0.0, u0, None))
print("max|J_num - J_ana| =", np.max(np.abs(J_num - J_ana)))
assert np.max(np.abs(J_num - J_ana)) < 1e-6

solver = NewtonSolver(2).set_enable_stats(True)
u = np.asarray(solver.solve(u0, residual, jacobian))
st = solver.get_stats()
print(f"analytic jac:  u = {u}  iterations = {st.n_iterations}")
assert abs(u[0] ** 2 + u[1] ** 2 - 4.0) < 1e-10
assert abs(u[0] * u[1] - 1.0) < 1e-10

solver2 = NewtonSolver(2)
solver2.use_numerical_jacobian = True
u2 = np.asarray(solver2.solve(u0, residual))
print(f"numerical jac: u = {u2}")
assert np.max(np.abs(u2 - u)) < 1e-8
print("ok")
