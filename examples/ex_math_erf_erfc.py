"""erf/erfc/erf_inv/erfc_inv round-trips (mirrors
russell_lab/examples/math_erf_erfc_functions.rs)."""
import _prelude  # noqa: F401
import numpy as np
from scipy import special as sp
from russell_tpu.math import erf, erfc, erf_inv, erfc_inv

for x in np.linspace(-2.5, 2.5, 11):
    assert abs(float(erf(x)) - sp.erf(x)) < 1e-14
    assert abs(float(erfc(x)) - sp.erfc(x)) < 1e-14
for p in np.linspace(-0.95, 0.95, 9):
    x = float(erf_inv(p))
    assert abs(float(erf(x)) - p) < 1e-12
q = float(erfc_inv(0.25))
assert abs(float(erfc(q)) - 0.25) < 1e-12
print("erf(1) =", float(erf(1.0)), "erf_inv(erf(1)) =",
      float(erf_inv(float(erf(1.0)))))
print("erf family OK")
