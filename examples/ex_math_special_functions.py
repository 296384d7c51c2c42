"""Special functions: Bessel field + elliptic arc length, vmapped+jitted
(mirrors russell_lab math examples)."""
import _prelude  # noqa: F401
import jax
import os as _os
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import numpy as np
from russell_tpu import math as rm

xs = np.linspace(0.0, 40.0, 9)
j0 = np.asarray(jax.jit(jax.vmap(rm.bessel_j0))(xs))
for x, v in zip(xs, j0):
    print(f"J0({x:5.1f}) = {v: .12f}")
L = 4 * 2 * float(rm.elliptic_e(np.pi / 2, 1 - 0.25))
print("ellipse (a=2,b=1) perimeter =", L)
assert abs(L - 9.688448220547675) < 1e-10
print("ok")
