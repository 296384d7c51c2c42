"""Dense numerical Jacobian vs analytical (mirrors
russell_lab/examples/algo_numerical_jacobian.rs)."""
import _prelude  # noqa: F401
import numpy as np
import jax.numpy as jnp
from russell_tpu.algo import num_jacobian

def f(x, u, _args=None):
    return jnp.asarray([
        2.0 * u[0] - u[1] + jnp.sin(x * u[2]),
        u[0] * u[1] - 3.0 * u[2],
        u[0] + u[1] + u[2] ** 2,
    ])

x = 0.5
u = np.asarray([1.0, 2.0, 0.5])
J = np.asarray(num_jacobian(f, x, u))
J_exact = np.asarray([
    [2.0, -1.0, x * np.cos(x * u[2])],
    [u[1], u[0], -3.0],
    [1.0, 1.0, 2.0 * u[2]],
])
err = np.max(np.abs(J - J_exact))
print("J =\n", np.array2string(J, precision=6))
print("max|J - J_exact| =", err)
assert err < 1e-7
print("numerical jacobian OK")
