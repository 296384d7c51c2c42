"""russell_tpu — a TPU-native scientific computing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``cpmech/russell`` Rust workspace (dense linear algebra, sparse matrices and
direct solvers, ODE/DAE steppers, PDE tools, nonlinear continuation,
statistics, and continuum-mechanics tensors), built TPU-first:

- arrays are ``jax.Array``; layout belongs to XLA (no column-major containers)
- compute-path kernels are XLA ops and Pallas TPU kernels
- multi-chip scaling rides ``jax.sharding.Mesh`` + collectives over ICI/DCN
- numerical status is returned as data so hot paths stay jittable

Subpackages
-----------
- ``core``   : test assertions (check), stopwatch/stats, base helpers
- ``math``   : special functions (Bessel, erf, gamma/beta, elliptic, ...)
- ``dense``  : dense linear algebra (the ``russell_lab`` surface)
- ``algo``   : interpolation, root finding, optimization, quadrature
- ``sparse`` : COO/CSR/CSC, Matrix Market I/O, native direct solvers
- ``ode``    : ODE/DAE steppers (ERK family, BwEuler, Radau5)
- ``pde``    : grids, FDM + spectral collocation, boundary conditions
- ``nonlin`` : numerical continuation (natural + pseudo-arclength)
- ``stat``   : probability distributions and descriptive statistics
- ``tensor`` : Mandel-basis tensors for continuum mechanics
- ``parallel``: device meshes, distributed SpMV/solvers

Reference feature map: see SURVEY.md at the repository root; docstrings cite
``/root/reference`` file:line for parity checking.
"""

from russell_tpu import core
from russell_tpu.core import (
    approx_eq,
    array_approx_eq,
    assert_alike,
    complex_approx_eq,
    complex_array_approx_eq,
    deriv1_approx_eq,
    deriv2_approx_eq,
    Norm,
    Stopwatch,
    format_fortran,
    format_scientific,
    format_nanoseconds,
    linspace,
    generate2d,
    generate3d,
)

__version__ = "0.1.0"
