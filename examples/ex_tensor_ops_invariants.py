"""Second-order tensor allocation, operations and stress invariants
(mirrors russell_tensor examples/allocating_second_order_tensors.rs and
the operations_t2.rs doc surface: dot/ddot/dyad + sigma_m/sigma_d/Lode)."""
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.tensor import (Mandel, Tensor2, t2_ddot_t2, t2_dot_t2,
                                t2_dyad_t2)

# symmetric tensor from its 3x3 matrix (allocating_second_order_tensors.rs)
sig = Tensor2.from_matrix([[1.0, 2.0, 0.0],
                           [2.0, -2.0, 0.0],
                           [0.0, 0.0, 3.0]], Mandel.SYMMETRIC)
m = np.asarray(sig.as_matrix())
assert np.allclose(m, [[1, 2, 0], [2, -2, 0], [0, 0, 3]])

# trace / determinant against numpy
assert abs(sig.trace() - 2.0) < 1e-14
assert abs(sig.determinant() - np.linalg.det(m)) < 1e-12

# mean/deviatoric stress invariants: sigma_m = I1/3,
# sigma_d = sqrt(3 J2) (von Mises)
i1 = sig.invariant_ii1()
j2 = sig.invariant_jj2()
assert abs(i1 - 2.0) < 1e-14
assert abs(sig.invariant_sigma_m() - i1 / 3.0) < 1e-14
assert abs(sig.invariant_sigma_d() - np.sqrt(3.0 * j2)) < 1e-12
lode = sig.invariant_lode()
assert -1.0 - 1e-12 <= lode <= 1.0 + 1e-12

# single and double contraction vs numpy
b = Tensor2.from_matrix([[2.0, 0.0, 1.0],
                         [0.0, 1.0, 0.0],
                         [1.0, 0.0, 2.0]], Mandel.SYMMETRIC)
ab = t2_dot_t2(sig, b)
assert np.allclose(np.asarray(ab.as_matrix()), m @ np.asarray(b.as_matrix()))
s = float(t2_ddot_t2(sig, b))
assert abs(s - np.sum(m * np.asarray(b.as_matrix()))) < 1e-12

# dyadic product -> fourth-order tensor in Mandel basis
D = t2_dyad_t2(1.0, sig, b)
# D : b == (b : b) sig
lhs = np.asarray(D.ddot_t2(b).as_matrix()) if hasattr(D, "ddot_t2") else None
if lhs is None:
    from russell_tpu.tensor import t4_ddot_t2
    lhs = np.asarray(t4_ddot_t2(1.0, D, b).as_matrix())
bb = float(t2_ddot_t2(b, b))
assert np.allclose(lhs, bb * m, atol=1e-12)

print("sigma_m =", sig.invariant_sigma_m(), " sigma_d =",
      sig.invariant_sigma_d(), " lode =", lode)
print("tensor ops/invariants OK")
