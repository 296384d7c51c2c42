"""Sparsity visualization: export a matrix to the vismatrix .smat format
and to MatrixMarket .mtx (mirrors russell_lab
examples/matrix_visualization.rs and russell_sparse's vismatrix flow)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import os
import tempfile
import numpy as np
from russell_tpu.sparse import (CooMatrix, read_matrix_market,
                                write_matrix_market, samples)

coo, _, _, _ = samples.umfpack_unsymmetric_5x5()
with tempfile.TemporaryDirectory() as tmp:
    smat = os.path.join(tmp, "matrix.smat")
    mtx = os.path.join(tmp, "matrix.mtx")
    write_matrix_market(coo, smat)          # vismatrix format by extension
    write_matrix_market(coo, mtx)
    print("--- vismatrix .smat ---")
    print(open(smat).read().strip())
    back, _ = read_matrix_market(mtx)
    assert np.allclose(np.asarray(back.as_dense()),
                       np.asarray(coo.as_dense()))
    print("round-trip through .mtx: exact")
print("ok")
