"""Ensemble integration: many stiff ODEs with independent adaptive
stepping in ONE device computation (vmap of the fused Radau5)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.ode import Method, OdeSolver, Params, samples

system, x0, y0, x1, args = samples.van_der_pol(1e-4, False)
solver = OdeSolver(Params(Method.RADAU5), system)
B = 32
y0s = np.tile(np.asarray(y0)[None, :], (B, 1))
y0s[:, 0] += np.linspace(-0.5, 0.5, B)
ys, st = solver.solve_batch(y0s, x0, 1.0)
acc = np.asarray(st["n_accepted"])
print(f"{B} stiff integrations in one computation; "
      f"steps per lane: min={acc.min()} max={acc.max()}")
assert np.all(np.asarray(st["status"]) == 1)
print("ok")
