"""Rectangular matrices: SVD-based pseudo-inverse and least-squares
(mirrors russell_lab's mat_pseudo_inverse doc surface on the rectangular
sample family of russell_sparse samples.rs: rectangular_3x4 et al.)."""
import _prelude  # noqa: F401
import numpy as np
import jax.numpy as jnp
from russell_tpu.dense import mat_pseudo_inverse, mat_svd

A = jnp.asarray([[1.0, 2.0, 0.0, 1.0],
                 [2.0, 0.0, 1.0, -1.0],
                 [0.0, 1.0, 3.0, 2.0]])
an = np.asarray(A)

# Moore-Penrose conditions
Ai = np.asarray(mat_pseudo_inverse(A))
assert np.allclose(an @ Ai @ an, an, atol=1e-12)
assert np.allclose(Ai @ an @ Ai, Ai, atol=1e-12)
assert np.allclose((an @ Ai).T, an @ Ai, atol=1e-12)
assert np.allclose((Ai @ an).T, Ai @ an, atol=1e-12)

# least-squares via pinv matches the normal-equations solution for an
# overdetermined system
B = jnp.asarray([[1.0, 1.0], [1.0, 2.0], [1.0, 3.0], [1.0, 4.0]])
y = jnp.asarray([6.0, 5.0, 7.0, 10.0])
coef = np.asarray(mat_pseudo_inverse(B)) @ np.asarray(y)
ref = np.linalg.lstsq(np.asarray(B), np.asarray(y), rcond=None)[0]
assert np.allclose(coef, ref, atol=1e-12)
print("least-squares line: intercept=%.4f slope=%.4f" % tuple(coef))

# SVD returns (s, u, vt): singular values match numpy's
res = mat_svd(A)
s = np.asarray(res[0])
assert np.allclose(np.sort(s)[::-1],
                   np.linalg.svd(an, compute_uv=False), atol=1e-12)
print("pseudo-inverse OK")
