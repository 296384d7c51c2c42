"""Gamma/beta/erf families, composition helpers, float utilities.

Reference surface: russell_lab/src/math/{gamma,ln_gamma,beta,erf,erf_inv,
functions,composition,modulo,complex}.rs. Thin vmappable wrappers over
jax.scipy.special where XLA already has the kernel; pure-jnp formulas
elsewhere.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
from jax.scipy import special as jss

__all__ = [
    "gamma", "ln_gamma", "beta", "ln_beta", "factorial_lookup_22",
    "erf", "erfc", "erf_inv", "erfc_inv",
    "neg_one_pow_n", "sign", "ramp", "heaviside", "boxcar", "logistic",
    "logistic_deriv1", "smooth_ramp", "smooth_ramp_deriv1",
    "smooth_ramp_deriv2", "suq_sin", "suq_cos",
    "float_is_integer", "float_is_neg_integer", "float_split",
    "float_decompose", "float_compose", "modulo",
    "i_pow_n", "x_times_i_pow_n",
]


def _f(x):
    return jnp.asarray(x, dtype=jnp.result_type(float))


# -- gamma family (gamma.rs, ln_gamma.rs, beta.rs) ---------------------------

def gamma(x):
    """Gamma(x) with poles at non-positive integers (gamma.rs)."""
    x = _f(x)
    out = jss.gamma(x)
    neg_int = (x <= 0.0) & (x == jnp.floor(x))
    return jnp.where(neg_int, jnp.nan, out)


def ln_gamma(x):
    """ln|Gamma(x)| (ln_gamma.rs; LAPACK-free)."""
    return jss.gammaln(_f(x))


def beta(a, b):
    """B(a, b) (beta.rs)."""
    return jss.beta(_f(a), _f(b))


def ln_beta(a, b):
    return jss.betaln(_f(a), _f(b))


_FACT22 = np.array([math.factorial(n) for n in range(23)], dtype=np.float64)


def factorial_lookup_22(n: int) -> float:
    """n! for n <= 22, exact in f64 (functions.rs: factorial_lookup_22)."""
    if n < 0 or n > 22:
        raise ValueError("n must be in 0..=22")
    return float(_FACT22[n])


# -- erf family (erf.rs, erf_inv.rs) -----------------------------------------

def erf(x):
    return jss.erf(_f(x))


def erfc(x):
    return jss.erfc(_f(x))


def erf_inv(x):
    """Inverse error function; +-inf at +-1, NaN outside (erf_inv.rs)."""
    x = _f(x)
    out = jss.erfinv(x)
    out = jnp.where(jnp.abs(x) > 1.0, jnp.nan, out)
    return jnp.where(jnp.abs(x) == 1.0, jnp.sign(x) * jnp.inf, out)


def erfc_inv(x):
    return erf_inv(1.0 - _f(x))


# -- composition functions (functions.rs) ------------------------------------

def neg_one_pow_n(n):
    """(-1)^n for integer n."""
    n = jnp.asarray(n)
    return jnp.where(n % 2 == 0, 1.0, -1.0)


def sign(x):
    return jnp.sign(_f(x))


def ramp(x):
    """max(x, 0) (Macaulay bracket)."""
    return jnp.maximum(_f(x), 0.0)


def heaviside(x):
    """0 for x<0, 1/2 at 0, 1 for x>0."""
    x = _f(x)
    return jnp.where(x < 0.0, 0.0, jnp.where(x > 0.0, 1.0, 0.5))


def boxcar(x, a, b):
    """heaviside(x-a) - heaviside(x-b)."""
    return heaviside(_f(x) - a) - heaviside(_f(x) - b)


def logistic(x):
    return jss.expit(_f(x))


def logistic_deriv1(x):
    z = logistic(x)
    return z * (1.0 - z)


def smooth_ramp(x, beta):
    """Smooth approximation of ramp: x + ln(1+exp(-beta x))/beta."""
    x = _f(x)
    # overflow-safe (functions.rs guards -beta*x > 500)
    return jnp.where(-beta * x > 500.0, 0.0,
                     x + jnp.log1p(jnp.exp(-beta * x)) / beta)


def smooth_ramp_deriv1(x, beta):
    x = _f(x)
    return jnp.where(-beta * x > 500.0, 0.0,
                     1.0 / (1.0 + jnp.exp(-beta * x)))


def smooth_ramp_deriv2(x, beta):
    x = _f(x)
    e = jnp.exp(-beta * jnp.clip(x, -500.0 / beta, 500.0 / beta))
    out = beta * e / (1.0 + e) ** 2
    return jnp.where(-beta * x > 500.0, 0.0, out)


def suq_sin(x, q):
    """Superquadric sine: sign(sin x) |sin x|^q."""
    s = jnp.sin(_f(x))
    return jnp.sign(s) * jnp.abs(s) ** q


def suq_cos(x, q):
    c = jnp.cos(_f(x))
    return jnp.sign(c) * jnp.abs(c) ** q


# -- float helpers (composition.rs, modulo.rs) -------------------------------

def float_is_integer(x) -> bool:
    x = float(x)
    return x == math.floor(x) and math.isfinite(x)


def float_is_neg_integer(x) -> bool:
    x = float(x)
    return x <= 0.0 and float_is_integer(x)


def float_split(x):
    """(integer_part, fractional_part) with the sign of x (modf)."""
    f, i = math.modf(float(x))
    return i, f


def float_decompose(x):
    """(mantissa, exponent) with x = mantissa * 2^exponent (frexp)."""
    return math.frexp(float(x))


def float_compose(mantissa, exponent):
    return math.ldexp(float(mantissa), int(exponent))


def modulo(x, y):
    """Floating-point modulo with the sign of x (Fortran MOD; modulo.rs)."""
    return jnp.fmod(_f(x), _f(y))


# -- complex helpers (complex.rs) --------------------------------------------

def i_pow_n(n: int):
    """i^n."""
    return (1j) ** (int(n) % 4)


def x_times_i_pow_n(x, n: int):
    """x * i^n without complex rounding error."""
    r = int(n) % 4
    if r == 0:
        return complex(x, 0.0)
    if r == 1:
        return complex(0.0, x)
    if r == 2:
        return complex(-x, 0.0)
    return complex(0.0, -x)
