"""Continuum-mechanics tensor calculus in the Mandel basis, TPU-first.

Re-designs ``russell_tensor`` (reference: russell_tensor/src/): Tensor2
(9D general / 6D symmetric / 4D symmetric-2D Mandel vectors) and Tensor4
(Mandel matrices). The Mandel basis makes every contraction a plain
vector/matrix product — t2:t2 is a dot product, t4:t2 a matvec, t4:t4 a
matmul — so all operations run natively on the MXU and are vmappable
over batches of tensors.
"""

from russell_tpu.tensor.enums import Mandel
from russell_tpu.tensor.tensor2 import Tensor2
from russell_tpu.tensor.tensor4 import Tensor4
from russell_tpu.tensor.operations import (
    t2_ddot_t2, t2_dot_t2, t2_dyad_t2, t2_odyad_t2, t2_udyad_t2,
    t2_qsd_t2, t4_ddot_t2, t2_ddot_t4, t4_ddot_t4, vec_dyad_vec,
    t2_add, t4_add)
from russell_tpu.tensor.derivatives import (
    deriv1_invariant_ii1, deriv1_invariant_ii2, deriv1_invariant_jj2,
    deriv1_invariant_jj3, deriv1_invariant_sigma_m, deriv1_invariant_sigma_d,
    deriv1_invariant_lode, deriv2_invariant_jj2, deriv2_invariant_jj3,
    deriv_inverse_tensor, deriv_squared_tensor)
from russell_tpu.tensor.lin_elasticity import LinElasticity
from russell_tpu.tensor.spectral2 import Spectral2

__all__ = [
    "Mandel", "Tensor2", "Tensor4",
    "t2_ddot_t2", "t2_dot_t2", "t2_dyad_t2", "t2_odyad_t2", "t2_udyad_t2",
    "t2_qsd_t2", "t4_ddot_t2", "t2_ddot_t4", "t4_ddot_t4", "vec_dyad_vec",
    "t2_add", "t4_add",
    "deriv1_invariant_ii1", "deriv1_invariant_ii2", "deriv1_invariant_jj2",
    "deriv1_invariant_jj3", "deriv1_invariant_sigma_m",
    "deriv1_invariant_sigma_d", "deriv1_invariant_lode",
    "deriv2_invariant_jj2", "deriv2_invariant_jj3", "deriv_inverse_tensor",
    "deriv_squared_tensor", "LinElasticity", "Spectral2",
]
