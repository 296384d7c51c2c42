"""Pseudo-arclength continuation along a snap-back B-spline curve:
G(u, lambda) = u - C(lambda) where C is a degree-2 B-spline whose control
point P3 snaps back, creating sharp turning points
(mirrors russell_nonlin examples/arclength_bspline.rs)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.nonlin import (Config, DeltaLambda, IniDir, Method, Output,
                                Solver, Stop, samples)

system, u0, l0, curve = samples.bspline_problem_1(1.5)

config = Config(method=Method.ARCLENGTH)
config.bordering = False          # standard un-bordered formulation
config.tg_control_tol = 0.2       # more steps in highly-curved regions
solver = Solver(config, system)
out = Output().set_recording([0, 1])

u, l, status = solver.solve(u0, l0, IniDir.POS, Stop.max_lambda(1.0),
                            DeltaLambda.auto(0.01), output=out)
assert status.success()
print(f"traced the branch to lambda = {l:.4f} in "
      f"{len(out.step_l)} accepted steps")

# every recorded point must sit on the B-spline curve: u == C(lambda)
for ux, uy, li in zip(out.step_u(0), out.step_u(1), out.step_l):
    cx, cy = curve(min(1.0, max(0.0, li)))
    assert abs(ux - cx) < 1e-6 and abs(uy - cy) < 1e-6
end = curve(1.0)
print(f"end of curve: u = ({float(u[0]):.4f}, {float(u[1]):.4f}), "
      f"C(1) = ({end[0]:.4f}, {end[1]:.4f})")
assert np.allclose(np.asarray(u), end, atol=1e-8)
print("ok")
