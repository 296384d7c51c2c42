"""Elliptic-PDE toolkit, TPU-first.

Re-designs ``russell_pde`` (reference: russell_pde/src/lib.rs:106-146):
structured grids (uniform + Chebyshev-Gauss-Lobatto), essential/natural
BC handlers, DOF partitioning, finite differences (Fdm1d/2d), spectral
collocation (Spc1d/2d and transfinite-mapped SpcMap2d), Coons-patch
transfinite maps + metrics, and both essential-BC strategies:
system partitioning (SPS) and Lagrange multipliers (LMM).
"""

from russell_tpu.pde.enums import Side
from russell_tpu.pde.grid import Grid1d, Grid2d
from russell_tpu.pde.bcs import (EssentialBcs1d, EssentialBcs2d,
                                 NaturalBcs1d, NaturalBcs2d)
from russell_tpu.pde.equation_handler import EquationHandler
from russell_tpu.pde.fdm import Fdm1d, Fdm2d
from russell_tpu.pde.spc import Spc1d, Spc2d
from russell_tpu.pde.spc_map import SpcMap2d
from russell_tpu.pde.transfinite import Transfinite2d, Transfinite3d
from russell_tpu.pde.metrics import Metrics
from russell_tpu.pde import problem_samples

__all__ = [
    "Side", "Grid1d", "Grid2d", "EssentialBcs1d", "EssentialBcs2d",
    "NaturalBcs1d", "NaturalBcs2d", "EquationHandler", "Fdm1d", "Fdm2d",
    "Spc1d", "Spc2d", "SpcMap2d", "Transfinite2d", "Transfinite3d",
    "Metrics", "problem_samples",
]
