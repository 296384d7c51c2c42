"""Vector operations tour: axpy/update, dot/inner, norms, scale/copy and
the outer product (mirrors russell_lab examples/vector_axpy_and_sum.rs,
vector_dot_scale_and_copy.rs, vector_norms.rs, vector_outer_product.rs)."""
import _prelude  # noqa: F401
import numpy as np
import jax.numpy as jnp
from russell_tpu.core import Norm
from russell_tpu.dense import (vec_add, vec_copy, vec_inner, vec_norm,
                               vec_outer, vec_scale, vec_update)

u = jnp.asarray([1.0, 2.0, 3.0, 4.0])
v = jnp.asarray([4.0, 3.0, 2.0, 1.0])

# w = alpha*u + beta*v (vector_axpy_and_sum.rs role)
w = vec_add(0.5, u, 2.0, v)
assert np.allclose(np.asarray(w), [8.5, 7.0, 5.5, 4.0])

# update: v += alpha*u
v2 = vec_update(2.0, u, v)
assert np.allclose(np.asarray(v2), [6.0, 7.0, 8.0, 9.0])

# dot, scale, copy (vector_dot_scale_and_copy.rs)
d = float(vec_inner(u, v))
assert d == 4.0 + 6.0 + 6.0 + 4.0
s = vec_scale(0.25, u)
c = vec_copy(s)
assert np.allclose(np.asarray(c), [0.25, 0.5, 0.75, 1.0])

# norms (vector_norms.rs): One = sum|.|, Euc = l2, Max = linf
x = jnp.asarray([-3.0, 4.0, 0.0])
assert float(vec_norm(x, Norm.ONE)) == 7.0
assert abs(float(vec_norm(x, Norm.EUC)) - 5.0) < 1e-15
assert float(vec_norm(x, Norm.MAX)) == 4.0

# outer product (vector_outer_product.rs): A = u v^T
A = vec_outer(1.0, u, v)
assert A.shape == (4, 4)
assert np.allclose(np.asarray(A), np.outer(np.asarray(u), np.asarray(v)))

print("u . v =", d)
print("outer(u, v) row 0 =", np.asarray(A)[0])
print("vector ops OK")
