"""Bessel functions J0/J1/Jn, Y0/Y1/Yn, I0/I1/In, K0/K1/Kn.

Reference surface: russell_lab/src/math/bessel_0.rs, bessel_1.rs,
bessel_n.rs, bessel_mod.rs (accuracy bar: |err| <= ~1e-15, enforced by
russell_lab/tests/more_tests_bessel_functions.rs against Abramowitz &
Stegun tables).

TPU-first design: every function is a vmappable/jittable pure function.
Piecewise branches are evaluated on both sides and combined with
``jnp.where`` (no data-dependent control flow). The small-argument parts
use Chebyshev expansions generated offline at 50-digit precision
(tools/gen_math_coeffs.py), evaluated by Clenshaw recurrence; the
large-argument parts use the Hankel modulus/phase decomposition
J/Y = sqrt(2/(pi x)) [P cos/sin(w) -/+ Q sin/cos(w)].
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import i0 as _i0, i1 as _i1, i0e as _i0e, i1e as _i1e

from russell_tpu.math import _coeffs as cf

__all__ = ["bessel_j0", "bessel_j1", "bessel_jn", "bessel_y0", "bessel_y1",
           "bessel_yn", "bessel_i0", "bessel_i1", "bessel_in", "bessel_k0",
           "bessel_k1", "bessel_kn"]

TWO_BY_PI = 2.0 / np.pi


def _clenshaw(coeffs: np.ndarray, t):
    """Evaluate sum_k c_k T_k(s) with s = 2t - 1 mapped from t in [0, 1]."""
    s = 2.0 * (2.0 * t - 1.0)  # 2*s for the recurrence
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for c in coeffs[:0:-1]:
        b1, b2 = s * b1 - b2 + c, b1
    return (s / 2.0) * b1 - b2 + coeffs[0]


def _cheb_on(coeffs: np.ndarray, x, a: float, b: float):
    t = jnp.clip((x - a) / (b - a), 0.0, 1.0)
    return _clenshaw(coeffs, t)


def _pq(n: int, x):
    """Hankel modulus/phase parts for |x| > 26 (DLMF 10.17.1; exact
    asymptotic coefficients, truncation error < 1e-25 for x >= 26)."""
    xs = jnp.maximum(x, 1.0)
    v = 1.0 / (xs * xs)
    pc = getattr(cf, f"P{n}_ASYMP")
    qc = getattr(cf, f"Q{n}_ASYMP")
    P = jnp.zeros_like(xs) + pc[-1]
    for c in pc[-2::-1]:
        P = P * v + c
    Q = jnp.zeros_like(xs) + qc[-1]
    for c in qc[-2::-1]:
        Q = Q * v + c
    Q = Q / xs
    w = xs - (2 * n + 1) * (np.pi / 4.0)
    fac = jnp.sqrt(2.0 / (np.pi * xs))
    return P, Q, w, fac


def _piecewise_jy(n: int, kind: str, x, small):
    """4-branch select: small [0,8], MID1 [8,17], MID2 [17,26], asymptotic."""
    K = kind.upper()
    mid1 = _cheb_on(getattr(cf, f"{K}{n}_MID1"), x, 8.0, 17.0)
    mid2 = _cheb_on(getattr(cf, f"{K}{n}_MID2"), x, 17.0, 26.0)
    P, Q, w, fac = _pq(n, x)
    if K == "J":
        asym = fac * (P * jnp.cos(w) - Q * jnp.sin(w))
    else:
        asym = fac * (P * jnp.sin(w) + Q * jnp.cos(w))
    out = jnp.where(x <= 8.0, small,
                    jnp.where(x <= 17.0, mid1,
                              jnp.where(x <= 26.0, mid2, asym)))
    return out


def bessel_j0(x):
    """J0(x) (bessel_0.rs; even function)."""
    x = jnp.abs(jnp.asarray(x, dtype=jnp.result_type(float)))
    t = jnp.clip((x / 8.0) ** 2, 0.0, 1.0)
    small = _clenshaw(cf.J0_SMALL, t)
    return _piecewise_jy(0, "J", x, small)


def bessel_j1(x):
    """J1(x) (bessel_1.rs; odd function)."""
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = jnp.clip((ax / 8.0) ** 2, 0.0, 1.0)
    small = ax * _clenshaw(cf.J1_SMALL, t)
    return sign * _piecewise_jy(1, "J", ax, small)


def bessel_y0(x):
    """Y0(x); -inf at 0, NaN for x < 0 (bessel_0.rs)."""
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    xs = jnp.maximum(x, 1e-300)
    t = jnp.clip((xs / 8.0) ** 2, 0.0, 1.0)
    small = _clenshaw(cf.Y0_SMALL, t) + TWO_BY_PI * jnp.log(xs) * bessel_j0(xs)
    out = _piecewise_jy(0, "Y", xs, small)
    out = jnp.where(x == 0.0, -jnp.inf, out)
    return jnp.where(x < 0.0, jnp.nan, out)


def bessel_y1(x):
    """Y1(x); -inf at 0, NaN for x < 0 (bessel_1.rs)."""
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    xs = jnp.maximum(x, 1e-300)
    t = jnp.clip((xs / 8.0) ** 2, 0.0, 1.0)
    small = (xs * _clenshaw(cf.Y1_SMALL, t) - TWO_BY_PI / xs
             + TWO_BY_PI * jnp.log(xs) * bessel_j1(xs))
    out = _piecewise_jy(1, "Y", xs, small)
    out = jnp.where(x == 0.0, -jnp.inf, out)
    return jnp.where(x < 0.0, jnp.nan, out)


def bessel_jn(n: int, x):
    """Jn(x) for integer n (bessel_n.rs): forward recurrence for n < |x|,
    Miller's backward recurrence otherwise (static trip counts)."""
    if n < 0:
        m = -n
        return jnp.where((m % 2) == 0, bessel_jn(m, x), -bessel_jn(m, x))
    if n == 0:
        return bessel_j0(x)
    if n == 1:
        return bessel_j1(x)
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    sign = jnp.where((n % 2 == 1) & (x < 0), -1.0, 1.0)
    ax = jnp.abs(x)
    axs = jnp.maximum(ax, 1e-30)

    # upward recurrence (stable when n <= ax)
    jm, jc = bessel_j0(ax), bessel_j1(ax)
    for k in range(1, n):
        jm, jc = jc, (2.0 * k / axs) * jc - jm
    up = jc

    # Miller's downward recurrence (stable when n > ax)
    m = 2 * ((n + int(np.sqrt(160.0 * n)) + 14) // 2)
    jp = jnp.zeros_like(ax)
    jc2 = jnp.ones_like(ax) * 1e-30
    s = jnp.zeros_like(ax)
    ans = jnp.zeros_like(ax)
    for k in range(m, 0, -1):
        jm2 = (2.0 * k / axs) * jc2 - jp
        jp = jc2
        jc2 = jm2
        # renormalize to avoid overflow
        big = jnp.abs(jc2) > 1e10
        jc2 = jnp.where(big, jc2 * 1e-10, jc2)
        jp = jnp.where(big, jp * 1e-10, jp)
        s = jnp.where(big, s * 1e-10, s)
        ans = jnp.where(big, ans * 1e-10, ans)
        if (k - 1) % 2 == 0:
            s = s + jc2
        if k == n:
            ans = jp
    s = 2.0 * s - jc2
    down = ans / s

    out = jnp.where(ax >= n, up, down)
    out = jnp.where(ax == 0.0, 0.0, out)
    return sign * out


def bessel_yn(n: int, x):
    """Yn(x) by upward recurrence (stable for Y)."""
    if n < 0:
        m = -n
        return jnp.where((m % 2) == 0, bessel_yn(m, x), -bessel_yn(m, x))
    if n == 0:
        return bessel_y0(x)
    if n == 1:
        return bessel_y1(x)
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    xs = jnp.maximum(x, 1e-300)
    ym, yc = bessel_y0(xs), bessel_y1(xs)
    for k in range(1, n):
        ym, yc = yc, (2.0 * k / xs) * yc - ym
    out = jnp.where(x == 0.0, -jnp.inf, yc)
    return jnp.where(x < 0.0, jnp.nan, out)


def bessel_i0(x):
    """Modified Bessel I0 (bessel_mod.rs; jax.scipy.special.i0)."""
    return _i0(jnp.asarray(x, dtype=jnp.result_type(float)))


def bessel_i1(x):
    return _i1(jnp.asarray(x, dtype=jnp.result_type(float)))


def bessel_in(n: int, x):
    """In(x) via Miller's downward recurrence (bessel_mod.rs)."""
    if n < 0:
        n = -n  # I_{-n} = I_n
    if n == 0:
        return bessel_i0(x)
    if n == 1:
        return bessel_i1(x)
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    sign = jnp.where((n % 2 == 1) & (x < 0), -1.0, 1.0)
    ax = jnp.abs(x)
    axs = jnp.maximum(ax, 1e-30)
    m = 2 * (n + int(np.sqrt(160.0 * n)) + 14)
    jp = jnp.zeros_like(ax)
    jc = jnp.ones_like(ax) * 1e-30
    ans = jnp.zeros_like(ax)
    for k in range(m, 0, -1):
        jm = (2.0 * k / axs) * jc + jp
        jp = jc
        jc = jm
        big = jnp.abs(jc) > 1e10
        jc = jnp.where(big, jc * 1e-10, jc)
        jp = jnp.where(big, jp * 1e-10, jp)
        ans = jnp.where(big, ans * 1e-10, ans)
        if k == n:
            ans = jp
    out = ans * bessel_i0(ax) / jc
    out = jnp.where(ax == 0.0, 0.0, out)
    return sign * out


def bessel_k0(x):
    """K0(x); +inf at 0, NaN for x < 0 (bessel_mod.rs)."""
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    xs = jnp.maximum(x, 1e-300)
    t_s = jnp.clip((xs / 2.0) ** 2, 0.0, 1.0)
    small = _clenshaw(cf.K0_SMALL, t_s) - jnp.log(xs / 2.0) * _i0(
        jnp.minimum(xs, 3.0))
    t_l = jnp.clip(2.0 / xs, 0.0, 1.0)
    large = _clenshaw(cf.K0_LARGE, t_l) * jnp.exp(-xs) / jnp.sqrt(xs)
    out = jnp.where(xs <= 2.0, small, large)
    out = jnp.where(x == 0.0, jnp.inf, out)
    return jnp.where(x < 0.0, jnp.nan, out)


def bessel_k1(x):
    """K1(x); +inf at 0, NaN for x < 0."""
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    xs = jnp.maximum(x, 1e-300)
    t_s = jnp.clip((xs / 2.0) ** 2, 0.0, 1.0)
    small = (xs * _clenshaw(cf.K1_SMALL, t_s) + 1.0 / xs
             + jnp.log(xs / 2.0) * _i1(jnp.minimum(xs, 3.0)))
    t_l = jnp.clip(2.0 / xs, 0.0, 1.0)
    large = _clenshaw(cf.K1_LARGE, t_l) * jnp.exp(-xs) / jnp.sqrt(xs)
    out = jnp.where(xs <= 2.0, small, large)
    out = jnp.where(x == 0.0, jnp.inf, out)
    return jnp.where(x < 0.0, jnp.nan, out)


def bessel_kn(n: int, x):
    """Kn(x) by upward recurrence (stable for K)."""
    if n < 0:
        n = -n
    if n == 0:
        return bessel_k0(x)
    if n == 1:
        return bessel_k1(x)
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    xs = jnp.maximum(x, 1e-300)
    km, kc = bessel_k0(xs), bessel_k1(xs)
    for k in range(1, n):
        km, kc = kc, (2.0 * k / xs) * kc + km
    out = jnp.where(x == 0.0, jnp.inf, kc)
    return jnp.where(x < 0.0, jnp.nan, out)
