"""Complex dense linear system + complex zip/unzip round trip
(mirrors russell_lab examples/complex_linear_system_solution_1.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.dense import (
    solve_lin_sys, complex_vec_zip, complex_vec_unzip,
)

a = np.array([[19.73, 12.11 - 1.0j, 0.0, 0.0],
              [-0.51 + 1.0j, 32.3 + 7.0j, 23.07, 0.0],
              [0.0, -0.51 + 1.0j, 70.0 + 7.3j, 3.95],
              [0.0, 0.0, 1.0 + 1.1j, 50.17]], dtype=np.complex128)
b = np.array([77.38 + 8.82j, 157.48 + 19.8j, 1175.62 + 20.69j,
              912.12 - 801.75j], dtype=np.complex128)
x = np.asarray(solve_lin_sys(a, b))
print("x =", np.round(x, 6))
assert np.max(np.abs(a @ x - b)) < 1e-10

# zip/unzip real<->complex planes
re, im = (np.asarray(m) for m in complex_vec_unzip(x))
x2 = np.asarray(complex_vec_zip(re, im))
assert np.allclose(x2, x)
print("zip/unzip round trip verified")
print("ok")
