"""Numerical continuation G(u, λ) = 0, TPU-first.

Re-designs ``russell_nonlin`` (reference: russell_nonlin/src/lib.rs:24-104):
natural-parameter and pseudo-arclength continuation with Euler predictors,
Newton correctors through the native device factorization (bordering
algorithm), PID-VCC tangent-based stepsize adaptation, stop criteria,
logger, and output recording.
"""

from russell_tpu.nonlin.config import (CONFIG_H_MIN, Config, DeltaLambda,
                                       IniDir, Method, Status, Stop)
from russell_tpu.nonlin.system import System, NoArgs
from russell_tpu.nonlin.stats import Stats, Workspace, IterationError
from russell_tpu.nonlin.solver import Solver
from russell_tpu.nonlin.solvers import SolverArclength, SolverNatural
from russell_tpu.nonlin.logger import Logger
from russell_tpu.nonlin.output import Output
from russell_tpu.nonlin import samples

__all__ = [
    "CONFIG_H_MIN", "Config", "DeltaLambda", "IniDir", "Method", "Status",
    "Stop", "System", "NoArgs", "Stats", "Workspace", "IterationError",
    "Solver", "SolverArclength", "SolverNatural", "Logger", "Output",
    "samples",
]
