"""Lagrange interpolation on Chebyshev-Gauss-Lobatto points: spectral
convergence of values and derivatives (mirrors russell_lab
examples/algo_interp_lagrange.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import math
import numpy as np
from russell_tpu.algo import InterpLagrange

def f(x):
    return math.cos(math.exp(2.0 * x))

def g(x):  # df/dx
    return -2.0 * math.exp(2.0 * x) * math.sin(math.exp(2.0 * x))

prev = None
for nn in (4, 8, 16, 32, 64):
    interp = InterpLagrange(nn)
    xx = interp.get_points()
    uu = np.array([f(x) for x in xx])
    err = max(abs(float(interp.eval(x, uu)) - f(x))
              for x in np.linspace(-1.0, 1.0, 101))
    print(f"N = {nn:3d}  max|p - f| = {err:.2e}  "
          f"Lebesgue ~ {interp.estimate_lebesgue_constant():.3f}")
    prev = err
assert prev < 1e-12            # spectral accuracy at N=64

interp = InterpLagrange(64)
xx = interp.get_points()
uu = np.array([f(x) for x in xx])
derr = max(abs(float(interp.eval_deriv1(x, uu)) - g(x))
           for x in np.linspace(-1.0, 1.0, 21))
print(f"max|p' - f'| = {derr:.2e}")
assert derr < 1e-8
print("ok")
