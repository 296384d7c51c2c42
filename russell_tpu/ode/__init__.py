"""ODE/DAE solvers, TPU-first.

Re-designs ``russell_ode`` (reference: russell_ode/src/lib.rs:193-226) for
JAX/XLA: rhs/Jacobian are traced pure functions, the per-step stage math
runs in fused jitted kernels (ERK tableaux unrolled; Radau5's real+complex
Newton systems factorized concurrently inside one XLA computation), and
the f64 step controllers run on the host to reproduce Hairer's Fortran
counters exactly.
"""

from russell_tpu.ode.enums import Method, Information
from russell_tpu.ode.system import System, NoArgs
from russell_tpu.ode.params import (Params, ParamsNewton, ParamsStep,
                                    ParamsStiffness, ParamsBwEuler,
                                    ParamsRadau5, ParamsERK)
from russell_tpu.ode.output import Output, OutData, OutCount
from russell_tpu.ode.stats import Stats, Workspace
from russell_tpu.ode.solver import OdeSolver
from russell_tpu.ode.detect_stiffness import detect_stiffness, StiffnessError
from russell_tpu.ode import samples

__all__ = [
    "Method", "Information", "System", "NoArgs", "Params", "ParamsNewton",
    "ParamsStep", "ParamsStiffness", "ParamsBwEuler", "ParamsRadau5",
    "ParamsERK", "Output", "OutData", "OutCount", "Stats", "Workspace",
    "OdeSolver", "detect_stiffness", "StiffnessError", "samples",
]
