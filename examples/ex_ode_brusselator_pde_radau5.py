"""Brusselator reaction-diffusion PDE solved by Radau5 — the reference's
flagship workload at acceptance scale (mirrors russell_ode
examples/brusselator_pde_radau5.rs and brusselator_pde_2nd_comparison.rs;
HW-II Fig 10.7). The method-of-lines system (ndim = 2·npoint²) carries a
sparse 5-point-molecule Jacobian; AUTO routes its factorization to the
grid multifrontal (GRIDMF) above the dense threshold, here it stays
small enough for the acceptance run. bench.py runs the same problem at
npoint=513 on the TPU."""
import _prelude  # noqa: F401
import numpy as np

from russell_tpu.ode import Method, OdeSolver, Params, samples

npoint = 9
alpha = 2e-3
system, t0, yy0, args = samples.brusselator_pde(alpha, npoint)
ndim = 2 * npoint * npoint
print(f"ndim = {ndim}, jac_nnz = {system.jac_nnz}")

params = Params(Method.RADAU5)
params.set_tolerances(1e-4, 1e-4)
solver = OdeSolver(params, system)
y = solver.solve(yy0, t0, 1.0, args=args, fused=True)
st = solver.stats()
print(st.summary())

u = np.asarray(y[: npoint * npoint])
v = np.asarray(y[npoint * npoint:])
print(f"u in [{u.min():.6f}, {u.max():.6f}], "
      f"v in [{v.min():.6f}, {v.max():.6f}]")
assert np.all(np.isfinite(np.asarray(y)))
assert st.n_steps > 5 and st.n_factor >= 1
# diffusion keeps both species in the reaction range (HW-II Fig 10.7:
# bounded by the sin/cos initial data peaks ~5 at t=1)
assert 0.0 < u.min() and u.max() < 5.5
assert 0.0 < v.min() and v.max() < 5.5

# second-book variant (periodic BCs + inhomogeneity, HW-II Eq 10.12)
system2, t02, yy02, args2 = samples.brusselator_pde(
    0.1, npoint, second_book=True)
solver2 = OdeSolver(params, system2)
y2 = solver2.solve(yy02, t02, 1.0, args=args2, fused=True)
assert np.all(np.isfinite(np.asarray(y2)))
print("second book:", solver2.stats().summary())
print("ok")
