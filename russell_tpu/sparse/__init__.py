"""Sparse matrices and native direct solvers, TPU-first.

Re-designs ``russell_sparse`` (reference: russell_sparse/src/lib.rs) for
JAX/XLA: COO is a host-side builder (FEM-style assembly with duplicates),
CSR/CSC are frozen pytrees whose *values* can be recomputed inside jit for a
fixed structure, and the external factorization backends (MUMPS/UMFPACK/cuDSS
shims, reference c_code/) are replaced by native factorizations that map onto
the MXU: dense LU, block-tridiagonal (banded) LU, and a general sparse
left-looking LU with host-side symbolic analysis.
"""

from russell_tpu.sparse.enums import Genie, Sym, MMsym, Ordering, Scaling
from russell_tpu.sparse.coo import CooMatrix
from russell_tpu.sparse.csr import CsrMatrix
from russell_tpu.sparse.csc import CscMatrix
from russell_tpu.sparse.matrix_market import read_matrix_market, write_matrix_market
from russell_tpu.sparse.verify import VerifyLinSys
from russell_tpu.sparse.lin_solver import LinSolver, LinSolParams, StatsLinSol
from russell_tpu.sparse.numerical_jacobian import numerical_jacobian
from russell_tpu.sparse.kernels import (BsrMatrix, bsr_from_coo,
                                        bsr_matvec, bsr_matmat,
                                        spgemm_plan, spgemm)
from russell_tpu.sparse import samples
