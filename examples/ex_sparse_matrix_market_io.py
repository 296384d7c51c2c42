"""MatrixMarket I/O round-trip + vismatrix (.smat) export
(mirrors russell_sparse read_matrix_market.rs / write_matrix_market.rs
doc examples)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import os
import tempfile
import numpy as np
from russell_tpu.sparse import (CooMatrix, read_matrix_market,
                                write_matrix_market, LinSolver, VerifyLinSys)

# read a reference fixture (symmetric storage handled via MMsym)
path = "/root/reference/russell_sparse/data/matrix_market/bfwb62.mtx"
coo, _ = read_matrix_market(path)
print("bfwb62:", coo.nrow, "x", coo.ncol, "nnz:", coo.nnz, "sym:", coo.sym)
assert (coo.nrow, coo.ncol) == (62, 62)

# solve it and verify the residual like solve_matrix_market does
sol = LinSolver()
sol.factorize(coo)
b = np.ones(coo.nrow)
x = sol.solve(b)
v = VerifyLinSys.from_system(coo, x, b)
print(f"relative_error: {v.relative_error:.3e}")
assert v.relative_error < 1e-10

# write -> read round-trip preserves the matrix exactly
with tempfile.TemporaryDirectory() as d:
    out = os.path.join(d, "roundtrip.mtx")
    write_matrix_market(coo, out)
    coo2, _ = read_matrix_market(out)
    # writer emits %.15e-style text: equal to ~1 ulp, not bit-exact
    assert np.allclose(coo.as_dense(), coo2.as_dense(),
                       rtol=1e-14, atol=1e-300)
    # vismatrix export (.smat) for visual inspection
    write_matrix_market(coo, os.path.join(d, "viz.smat"), vismatrix=True)
    assert os.path.getsize(os.path.join(d, "viz.smat")) > 0
print("ok")
