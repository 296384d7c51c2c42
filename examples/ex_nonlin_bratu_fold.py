"""1-D Bratu problem: spectral collocation + pseudo-arclength through
the fold, then extended-system Newton polish of the critical lambda
(mirrors russell_nonlin/tests/test_bratu_problem.rs; Mathematica oracle
lambda_crit = 3.51383071912516)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
import jax.numpy as jnp
from russell_tpu.nonlin import (Config, DeltaLambda, IniDir, Method, Output,
                                Solver, Stop, samples)

system, u0, l0, mid = samples.bratu_1d_spc(20, alpha=0.0)
sol = Solver(Config(method=Method.ARCLENGTH), system)
out = Output().set_recording(list(range(system.ndim)))
_u, _l, status = sol.solve(u0, l0, IniDir.POS, Stop.max_comp_u(mid, 20.0),
                           DeltaLambda.auto(0.5), output=out)
assert status.success()
ls = np.asarray(out.step_l)
um = np.asarray(out.step_u(mid))
print("path:  lambda  phi(1/2)")
for l, um_ in zip(ls, um):
    print(f"  {l:8.5f}  {um_:8.5f}")

# fold = the discrete maximum of lambda along the path, polished by
# Newton on [G; Gu v; v_k - 1] = 0
j = int(np.argmax(ls))
n = system.ndim
uj = np.stack([out.step_u(m) for m in range(n)], axis=1)[j]


def gu_mat(l, u):
    vals, _ = system.calc_jac(l, u, None)
    return jnp.reshape(vals, (n, n))


w, vv = np.linalg.eig(np.asarray(gu_mat(ls[j], jnp.asarray(uj))))
v = np.real(vv[:, np.argmin(np.abs(w))])
k = int(np.argmax(np.abs(v)))
z = jnp.concatenate([jnp.asarray(uj), jnp.asarray(v / v[k]),
                     jnp.asarray([ls[j]])])


def ff(z):
    u, v, l = z[:n], z[n:2 * n], z[2 * n]
    return jnp.concatenate([jnp.asarray(system.calc_gg(l, u, None)),
                            gu_mat(l, u) @ v, jnp.asarray([v[k] - 1.0])])


for _ in range(30):
    dz = jnp.linalg.solve(jax.jacfwd(ff)(z), -ff(z))
    z = z + dz
    if float(jnp.max(jnp.abs(dz))) < 1e-12:
        break
lam_crit = float(z[2 * n])
print(f"lambda_crit = {lam_crit:.12f} (Mathematica: 3.513830719125)")
assert abs(lam_crit - 3.51383071912516) < 1e-9
print("ok")
