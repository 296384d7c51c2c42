"""Chebyshev-Gauss and Chebyshev-Gauss-Lobatto point familes (mirrors
russell_lab/examples/math_chebyshev_points.rs)."""
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.math import (chebyshev_gauss_points,
                              chebyshev_lobatto_points, chebyshev_tn)

n = 8
g = np.asarray(chebyshev_gauss_points(n))
l = np.asarray(chebyshev_lobatto_points(n))
print("gauss  :", np.array2string(g, precision=4))
print("lobatto:", np.array2string(l, precision=4))
# Gauss points are the roots of T_{n+1}; Lobatto points the extrema
for x in g:
    assert abs(float(chebyshev_tn(n + 1, x))) < 1e-13
assert abs(l[0] + 1.0) < 1e-15 and abs(l[-1] - 1.0) < 1e-15
for x in l[1:-1]:
    assert abs(float(chebyshev_tn(n, x))) in (0.0,) or \
        abs(abs(float(chebyshev_tn(n, x))) - 1.0) < 1e-12
print("chebyshev points OK")
