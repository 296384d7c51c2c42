"""Out-of-core GRIDMF: when the multifrontal factor store exceeds the
HBM budget (RUSSELL_TPU_GRIDMF_MEM_GB), factors stream to host RAM
depth by depth and solves re-ship them per level — the cuDSS hybrid
host/device memory-mode analog (interface_cudss.cu:351; MUMPS
ICNTL(14)/(23) role). Demonstrated here with an artificially tiny
budget; laplacian_3d_101 (19.7 GB of factors) is the real use."""
import os
os.environ["RUSSELL_TPU_GRIDMF_MEM_GB"] = "1e-9"   # force OOC
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.sparse import (Genie, LinSolParams, LinSolver,
                                VerifyLinSys, samples)

coo = samples.laplacian_2d(32)
sol = LinSolver(Genie.GRIDMF)
sol.factorize(coo, LinSolParams(grid=(32, 32, 1)))
assert sol.stats.output.get("out_of_core") is True

# every level's factors live in HOST numpy, not HBM
lv0 = sol.fac["levels"][0]
assert isinstance(lv0["sir"], np.ndarray)
tot = sum(st["sir"].nbytes + (st["lr"].nbytes if st["lr"] is not None
                              else 0) + (st["br"].nbytes if st["br"] is not
                                         None else 0)
          for st in sol.fac["levels"])
print(f"host-resident factor store: {tot/2**20:.2f} MiB "
      f"over {len(sol.fac['levels'])} levels")

b = np.linspace(1.0, 2.0, coo.nrow)
x = sol.solve(b)
v = VerifyLinSys.from_system(coo, x, b)
print("relative_error =", v.relative_error)
assert v.relative_error < 1e-10

mant, base, expo = sol.determinant()
sign, logabs = np.linalg.slogdet(np.asarray(coo.as_dense()))
assert np.sign(mant) == sign
assert abs(expo + np.log10(abs(mant)) - logabs / np.log(10)) < 1e-7
print("out-of-core gridmf OK")
