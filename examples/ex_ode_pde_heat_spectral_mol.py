"""Method of lines: 1-D heat equation semi-discretized by Chebyshev
spectral collocation, integrated by Radau5 (mirrors
russell_ode/examples/pde_1d_heat_spectral_collocation.rs).

    du/dt = d2u/dx2 on [0,1], u(0)=u(1)=0, u0 = sin(pi x)
    analytic: u(x,t) = exp(-pi^2 t) sin(pi x)
"""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import math
import numpy as np
import jax.numpy as jnp
from russell_tpu.algo.interp_lagrange import InterpLagrange
from russell_tpu.ode import Method, OdeSolver, Params, System

npt = 16
interp = InterpLagrange(npt - 1)
interp.calc_dd2_matrix()
kk = 4.0 * interp.get_dd2()          # map [-1,1] -> [0,1]: (dr/dx)^2 = 4
interior = np.arange(1, npt - 1)
kbar = jnp.asarray(kk[np.ix_(interior, interior)])
x = (1.0 + np.asarray(interp.xx)[interior]) / 2.0
ndim = npt - 2

system = System(ndim, lambda t, y, args: kbar @ y)
ii, jj = np.meshgrid(np.arange(ndim), np.arange(ndim), indexing="ij")
system.set_jacobian((ii.ravel(), jj.ravel()),
                    lambda t, y, args: jnp.ravel(kbar))

params = Params(Method.RADAU5)
params.set_tolerances(1e-10, 1e-10)
solver = OdeSolver(params, system)
t1 = 0.1
y = np.asarray(solver.solve(np.sin(math.pi * x), 0.0, t1))
exact = math.exp(-math.pi ** 2 * t1) * np.sin(math.pi * x)
err = np.max(np.abs(y - exact))
print(solver.stats().summary())
print(f"max |u - exact| at t={t1}: {err:.3e}")
# npt=16 collocation reaches ~1e-9: both space (spectral) and time
# (tol 1e-10) errors are tiny
assert err < 5e-9
print("ok")
