"""Composition-function tables: ramp, heaviside, boxcar, logistic and
their derivatives (mirrors russell_lab/examples/math_plot_functions.rs —
tabulated rather than plotted)."""
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.math.basic import (boxcar, heaviside, logistic,
                                    logistic_deriv1, ramp, sign, suq_cos,
                                    suq_sin)

xs = np.linspace(-2.0, 2.0, 9)
print(f"{'x':>6} {'ramp':>8} {'heaviside':>10} {'boxcar':>8} {'logistic':>10}")
for x in xs:
    r = float(ramp(x))
    h = float(heaviside(x))
    b = float(boxcar(x, -1.0, 1.0))
    lg = float(logistic(x))
    print(f"{x:6.2f} {r:8.3f} {h:10.3f} {b:8.3f} {lg:10.5f}")
    assert r == max(x, 0.0)
    assert abs(lg - 1.0 / (1.0 + np.exp(-x))) < 1e-15
assert float(sign(-3.0)) == -1.0 and float(sign(2.0)) == 1.0
assert abs(float(logistic_deriv1(0.0)) - 0.25) < 1e-15
print("suq_sin(0.3, 2) =", float(suq_sin(0.3, 2.0)),
      "suq_cos(0.3, 2) =", float(suq_cos(0.3, 2.0)))
print("composition functions OK")
