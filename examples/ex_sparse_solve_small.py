"""Solve the reference's umfpack 5x5 sample with every native genie
(mirrors russell_sparse examples/doc_umfpack_quickstart.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.sparse import Genie, LinSolver, VerifyLinSys, samples

coo, _, _, det = samples.umfpack_unsymmetric_5x5()
rhs = np.array([8.0, 45.0, -3.0, 3.0, 19.0])
for genie in (Genie.DENSE, Genie.BANDED, Genie.SPLU):
    solver = LinSolver(genie)
    solver.factorize(coo)
    x = solver.solve(rhs)
    v = VerifyLinSys.from_system(coo, x, rhs)
    print(f"{genie.value:>6}: x = {np.round(np.asarray(x), 6)} "
          f"rel_err = {v.relative_error:.2e}")
    assert v.relative_error < 1e-12
print("ok")
