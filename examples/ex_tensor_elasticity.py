"""Mandel-basis elasticity: strain -> stress -> invariants -> spectral
decomposition (mirrors russell_tensor examples)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.tensor import LinElasticity, Mandel, Spectral2, Tensor2

eps = Tensor2.from_matrix(np.array([[1e-3, 2e-4, 0.0],
                                    [2e-4, -5e-4, 1e-4],
                                    [0.0, 1e-4, 2e-4]]), Mandel.SYMMETRIC)
le = LinElasticity(young=210e3, poisson=0.3)
sig = le.calc_stress(eps)
print("sigma_m =", float(sig.invariant_sigma_m()))
print("sigma_d =", float(sig.invariant_sigma_d()))
sp = Spectral2().decompose(sig)
print("principal stresses:", np.sort(np.asarray(sp.lambdas)))
back = sp.compose(sp.lambdas)
assert float(np.max(np.abs(np.asarray(back.vec - sig.vec)))) < 1e-9
print("ok")
