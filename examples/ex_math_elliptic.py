"""Elliptic integrals F(phi,m), E(phi,m), Pi(n,phi,m) via Carlson forms
(mirrors russell_lab/examples/math_elliptic_functions.rs)."""
import _prelude  # noqa: F401
import numpy as np
from scipy import special as sp
from russell_tpu.math import elliptic_e, elliptic_f, elliptic_pi

for phi in np.linspace(0.1, 1.4, 6):
    for m in (0.1, 0.5, 0.9):
        f = float(elliptic_f(phi, m))
        e = float(elliptic_e(phi, m))
        assert abs(f - sp.ellipkinc(phi, m)) < 1e-12
        assert abs(e - sp.ellipeinc(phi, m)) < 1e-12
        print(f"phi={phi:4.2f} m={m:3.1f} F={f:10.6f} E={e:10.6f}")
p = float(elliptic_pi(0.3, 0.8, 0.5))
print("Pi(0.3, 0.8, 0.5) =", p)
print("elliptic OK")
