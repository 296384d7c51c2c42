"""Vector (BLAS L1-class) operations.

Reference: russell_lab/src/vector/ (35 files: vec_add, vec_copy, vec_inner,
vec_norm, vec_scale, vec_update, vec_rms_scaled, vec_max_scaled_diff,
vec_all_finite, complex_vec_zip/unzip, ...). All jittable, dtype-polymorphic;
``complex_*`` twins are covered by passing complex arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from russell_tpu.core.enums import Norm, vec_norm  # re-exported

__all__ = [
    "vec_add", "vec_copy", "vec_inner", "vec_norm", "vec_scale", "vec_update",
    "vec_rms_scaled", "vec_max_abs_diff", "vec_max_scaled", "vec_all_finite",
    "vec_fmt_scientific", "complex_vec_zip", "complex_vec_unzip",
]


def vec_add(alpha, u, beta, v):
    """w = alpha*u + beta*v (vector/vec_add.rs)."""
    return alpha * jnp.asarray(u) + beta * jnp.asarray(v)


def vec_copy(u):
    return jnp.array(u, copy=True)


def vec_inner(u, v):
    """Dot product u . v (vector/vec_inner.rs)."""
    return jnp.vdot(jnp.asarray(u), jnp.asarray(v)).real if (
        jnp.iscomplexobj(u)) else jnp.dot(jnp.asarray(u), jnp.asarray(v))


def vec_scale(alpha, u):
    return alpha * jnp.asarray(u)


def vec_update(alpha, u, v):
    """v += alpha * u (vector/vec_update.rs)."""
    return jnp.asarray(v) + alpha * jnp.asarray(u)


def vec_rms_scaled(u, reference, atol, rtol):
    """Scaled root-mean-square norm sqrt(mean((u_i/(atol+rtol|ref_i|))^2))
    (vector/vec_rms_scaled.rs) — the ODE error-control norm."""
    u = jnp.asarray(u)
    ref = jnp.asarray(reference)
    scale = atol + rtol * jnp.abs(ref)
    return jnp.sqrt(jnp.mean(jnp.abs(u / scale) ** 2))


def vec_max_abs_diff(u, v):
    """max |u_i - v_i| (vector/vec_max_abs_diff.rs)."""
    return jnp.max(jnp.abs(jnp.asarray(u) - jnp.asarray(v)))


def vec_max_scaled(u, reference):
    """max |u_i| / (1 + |ref_i|) (vector/vec_max_scaled.rs)."""
    u = jnp.asarray(u)
    ref = jnp.asarray(reference)
    return jnp.max(jnp.abs(u) / (1.0 + jnp.abs(ref)))


def vec_all_finite(u):
    """True iff every component is finite (vector/vec_all_finite.rs) —
    the ODE anomaly check (ode_solver.rs:253). Jittable (returns bool array)."""
    return jnp.all(jnp.isfinite(jnp.asarray(u)))


def complex_vec_zip(real, imag):
    """Complex vector from (real, imag) parts (vector/complex_vec_zip.rs) —
    Radau5 builds its complex Newton rhs this way (radau5.rs:445)."""
    return jnp.asarray(real) + 1j * jnp.asarray(imag)


def complex_vec_unzip(z):
    z = jnp.asarray(z)
    return jnp.real(z), jnp.imag(z)


from russell_tpu.core.formatters import vec_fmt_scientific  # noqa: E402,F401
