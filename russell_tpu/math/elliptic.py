"""Elliptic integrals (reference: russell_lab/src/math/elliptic.rs).

Same API as the reference: elliptic_f(phi, m), elliptic_e(phi, m),
elliptic_pi(n, phi, m) — Legendre forms with parameter m = k².
Implemented via Carlson symmetric forms RF/RD/RJ/RC with the duplication
algorithm (Carlson 1995), which is the standard double-precision method;
fixed iteration counts keep everything jittable (lax.while_loop-free:
~30 duplications reduce the error bound far below 1e-16 for any input).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["elliptic_f", "elliptic_e", "elliptic_pi",
           "carlson_rf", "carlson_rd", "carlson_rj", "carlson_rc"]

_N_DUP = 26  # each duplication quarters the arguments' spread


def carlson_rf(x, y, z):
    """Carlson RF(x, y, z) — symmetric elliptic integral of the 1st kind."""
    x, y, z = jnp.broadcast_arrays(*map(jnp.asarray, (x, y, z)))

    def body(carry, _):
        x, y, z = carry
        sx, sy, sz = jnp.sqrt(x), jnp.sqrt(y), jnp.sqrt(z)
        lam = sx * sy + sy * sz + sz * sx
        return ((x + lam) / 4, (y + lam) / 4, (z + lam) / 4), None

    (x, y, z), _ = jax.lax.scan(body, (x, y, z), None, length=_N_DUP)
    mu = (x + y + z) / 3.0
    dx = 1.0 - x / mu
    dy = 1.0 - y / mu
    dz = 1.0 - z / mu
    e2 = dx * dy + dy * dz + dz * dx
    e3 = dx * dy * dz
    s = 1.0 - e2 / 10.0 + e3 / 14.0 + e2 * e2 / 24.0 - 3.0 * e2 * e3 / 44.0
    return s / jnp.sqrt(mu)


def carlson_rc(x, y):
    """Carlson RC(x, y) (degenerate RF)."""
    return carlson_rf(x, y, y)


def carlson_rd(x, y, z):
    """Carlson RD(x, y, z) — symmetric integral of the 2nd kind."""
    x, y, z = jnp.broadcast_arrays(*map(jnp.asarray, (x, y, z)))

    def body(carry, _):
        x, y, z, ssum, fac = carry
        sx, sy, sz = jnp.sqrt(x), jnp.sqrt(y), jnp.sqrt(z)
        lam = sx * sy + sy * sz + sz * sx
        ssum = ssum + fac / (sz * (z + lam))
        fac = fac / 4.0
        return ((x + lam) / 4, (y + lam) / 4, (z + lam) / 4, ssum, fac), None

    ssum = jnp.zeros_like(x)
    fac = jnp.ones_like(x)
    (x, y, z, ssum, fac), _ = jax.lax.scan(
        body, (x, y, z, ssum, fac), None, length=_N_DUP)
    mu = (x + y + 3.0 * z) / 5.0
    dx = 1.0 - x / mu
    dy = 1.0 - y / mu
    dz = 1.0 - z / mu
    ea = dx * dy
    eb = dz * dz
    ec = ea - eb
    ed = ea - 6.0 * eb
    ee = ed + 2.0 * ec
    s = (1.0 + ed * (-3.0 / 14.0 + 9.0 / 88.0 * ed - 4.5 / 26.0 * dz * ee)
         + dz * (1.0 / 6.0 * ee + dz * (-9.0 / 22.0 * ec
                                        + 3.0 / 26.0 * dz * ea)))
    return 3.0 * ssum + fac * s / (mu * jnp.sqrt(mu))


def carlson_rj(x, y, z, p):
    """Carlson RJ(x, y, z, p) — symmetric integral of the 3rd kind
    (p > 0 branch)."""
    x, y, z, p = jnp.broadcast_arrays(*map(jnp.asarray, (x, y, z, p)))

    def body(carry, _):
        x, y, z, p, ssum, fac = carry
        sx, sy, sz = jnp.sqrt(x), jnp.sqrt(y), jnp.sqrt(z)
        lam = sx * sy + sy * sz + sz * sx
        alpha = (p * (sx + sy + sz) + sx * sy * sz) ** 2
        beta = p * (p + lam) ** 2
        ssum = ssum + fac * carlson_rc(alpha, beta)
        fac = fac / 4.0
        return ((x + lam) / 4, (y + lam) / 4, (z + lam) / 4, (p + lam) / 4,
                ssum, fac), None

    ssum = jnp.zeros_like(x)
    fac = jnp.ones_like(x)
    (x, y, z, p, ssum, fac), _ = jax.lax.scan(
        body, (x, y, z, p, ssum, fac), None, length=14)
    mu = (x + y + z + 2.0 * p) / 5.0
    dx = 1.0 - x / mu
    dy = 1.0 - y / mu
    dz = 1.0 - z / mu
    dp = 1.0 - p / mu
    ea = dx * (dy + dz) + dy * dz
    eb = dx * dy * dz
    ec = dp * dp
    ed = ea - 3.0 * ec
    ee = eb + 2.0 * dp * (ea - ec)
    s = (1.0 + ed * (-3.0 / 14.0 + 9.0 / 88.0 * ed - 4.5 / 26.0 * ee)
         + eb * (1.0 / 6.0 + dp * (-6.0 / 22.0 + dp * 3.0 / 26.0))
         + dp * ea * (1.0 / 3.0 - dp * 3.0 / 22.0) - 1.0 / 3.0 * dp * ec)
    return 3.0 * ssum + fac * s / (mu * jnp.sqrt(mu))


def elliptic_f(phi, m):
    """Incomplete elliptic integral of the 1st kind F(phi, m), m = k²
    (elliptic.rs: elliptic_f). Requires 0 <= phi <= pi/2, m sin²phi <= 1."""
    phi = jnp.asarray(phi, dtype=jnp.result_type(float))
    m = jnp.asarray(m, dtype=jnp.result_type(float))
    s = jnp.sin(phi)
    c2 = jnp.cos(phi) ** 2
    mss = m * s * s
    q = 1.0 - mss
    out = s * carlson_rf(c2, jnp.maximum(q, 1e-300), jnp.ones_like(q))
    eps = np.finfo(np.float64).eps
    # m sin²φ == 1: F diverges (elliptic.rs:72-74 contract)
    out = jnp.where(jnp.abs(mss - 1.0) < 10 * eps, jnp.inf, out)
    bad = (phi < 0) | (phi > np.pi / 2 + 1e-14) | (mss > 1.0 + 10 * eps)
    return jnp.where(bad, jnp.nan, out)


def elliptic_e(phi, m):
    """Incomplete elliptic integral of the 2nd kind E(phi, m)."""
    phi = jnp.asarray(phi, dtype=jnp.result_type(float))
    m = jnp.asarray(m, dtype=jnp.result_type(float))
    s = jnp.sin(phi)
    c2 = jnp.cos(phi) ** 2
    q = 1.0 - m * s * s
    qs = jnp.maximum(q, 1e-300)
    out = s * (carlson_rf(c2, qs, 1.0)
               - (m * s * s / 3.0) * carlson_rd(c2, qs, 1.0))
    # m sin2 == 1 edge: E = sin(phi) exactly? E(phi,1) = sin(phi)
    out = jnp.where(jnp.abs(q) < 1e-15, s, out)
    bad = (phi < 0) | (phi > np.pi / 2 + 1e-14) | (m * s * s > 1.0 + 1e-14)
    return jnp.where(bad, jnp.nan, out)


def elliptic_pi(n, phi, m):
    """Incomplete elliptic integral of the 3rd kind Pi(n; phi, m) with the
    reference's sign convention (elliptic.rs: integrand
    1/((1 - n sin²t) sqrt(1 - m sin²t)))."""
    n = jnp.asarray(n, dtype=jnp.result_type(float))
    phi = jnp.asarray(phi, dtype=jnp.result_type(float))
    m = jnp.asarray(m, dtype=jnp.result_type(float))
    s = jnp.sin(phi)
    c2 = jnp.cos(phi) ** 2
    mss = m * s * s
    q = 1.0 - mss
    ns2 = n * s * s
    out = s * (carlson_rf(c2, jnp.maximum(q, 1e-300), 1.0)
               + (ns2 / 3.0)
               * carlson_rj(c2, jnp.maximum(q, 1e-300), jnp.ones_like(q),
                            jnp.maximum(1.0 - ns2, 1e-300)))
    eps = np.finfo(np.float64).eps
    # m sin²φ == 1 or n sin²φ == 1: Π diverges (elliptic.rs:222-228)
    sing = (jnp.abs(mss - 1.0) < 10 * eps) | (jnp.abs(ns2 - 1.0) < 10 * eps)
    out = jnp.where(sing, jnp.inf, out)
    bad = ((phi < 0) | (phi > np.pi / 2 + 1e-14)
           | (mss > 1.0 + 10 * eps) | (ns2 > 1.0 + 10 * eps))
    return jnp.where(bad & ~sing, jnp.nan, out)
