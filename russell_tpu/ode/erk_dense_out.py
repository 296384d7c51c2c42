"""Dense output for DoPri5 / DoPri8 (reference: russell_ode/src/erk_dense_out.rs).

DoPri5: 5 interpolation vectors built from the accepted stages (no extra
function evaluations). DoPri8: 8 vectors requiring 3 extra stages
(dop853.f's a14-a16 rows). Both are computed by a single jitted kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from russell_tpu.ode import constants as C
from russell_tpu.ode.enums import Method

__all__ = ["ErkDenseOut"]


class ErkDenseOut:
    def __init__(self, method: Method, ndim: int, system):
        if method not in (Method.DOPRI5, Method.DOPRI8):
            raise ValueError(
                f"dense output is not available for the {method.name} method")
        self.method = method
        self.ndim = ndim
        self.system = system
        self.d = None
        self._update5 = jax.jit(self._build_dopri5())
        self._update8 = jax.jit(self._build_dopri8())

    def _build_dopri5(self):
        dd = C.DOPRI5_D

        def update(x, y, h, w, k, args):
            y_diff = w - y
            b_spl = h * k[0] - y_diff
            d4 = h * (dd[0] * k[0] + dd[2] * k[2] + dd[3] * k[3]
                      + dd[4] * k[4] + dd[5] * k[5] + dd[6] * k[6])
            return jnp.stack([y, y_diff, b_spl, y_diff - h * k[6] - b_spl, d4])

        return update

    def _build_dopri8(self):
        f = self.system.function
        dd, aad, ccd = C.DOPRI8_D, C.DOPRI8_AD, C.DOPRI8_CD

        def update(x, y, h, w, k, args):
            # 3 extra stages (dop853.f lines for a14..a16); note the
            # reference uses k[12] == k[11] because its k has 12 entries
            def comb(row, kd_list):
                acc = jnp.zeros_like(y)
                for j in range(12):
                    a = row[j]
                    if a != 0.0:
                        acc = acc + a * k[j]
                # column 12 multiplies k[11] again (dop853 13th stage = FSAL)
                if row[12] != 0.0:
                    acc = acc + row[12] * k[11]
                for extra, kd in enumerate(kd_list):
                    a = row[13 + extra]
                    if a != 0.0:
                        acc = acc + a * kd
                return acc

            kd = []
            for s in range(3):
                yd = y + h * comb(aad[s], kd)
                kd.append(f(x + ccd[s] * h, yd, args))

            y_diff = w - y
            b_spl = h * k[0] - y_diff
            d0, d1, d2 = y, y_diff, b_spl
            d3 = y_diff - h * k[11] - b_spl
            drows = []
            for r in range(4):
                row = dd[r]
                acc = jnp.zeros_like(y)
                for j in range(12):
                    if row[j] != 0.0:
                        acc = acc + row[j] * k[j]
                if row[12] != 0.0:
                    acc = acc + row[12] * k[11]
                for extra in range(3):
                    if row[13 + extra] != 0.0:
                        acc = acc + row[13 + extra] * kd[extra]
                drows.append(h * acc)
            return jnp.stack([d0, d1, d2, d3] + drows)

        return update

    def update(self, x, y, h, w, k, args) -> int:
        """Store interpolation vectors; returns extra function-eval count."""
        if self.method == Method.DOPRI5:
            self.d = self._update5(x, y, h, w, k, args)
            return 0
        self.d = self._update8(x, y, h, w, k, args)
        return 3

    def calculate(self, x_out, x, h):
        d = self.d
        theta = (x_out - (x - h)) / h
        u = 1.0 - theta
        if self.method == Method.DOPRI5:
            return d[0] + theta * (d[1] + u * (d[2] + theta * (d[3] + u * d[4])))
        par = d[4] + theta * (d[5] + u * (d[6] + theta * d[7]))
        return d[0] + theta * (d[1] + u * (d[2] + theta * (d[3] + u * par)))
