"""Fully-fused explicit Runge-Kutta variable-step solver.

The ERK analog of radau5_fused: the entire embedded-error-controlled
integration (ode_solver.rs:278-366 + explicit_runge_kutta.rs step/accept/
reject with Lund stabilization) traced into one ``lax.while_loop``.
Counters follow the host path exactly (validated in tests). No dense
output / stiffness detection here — use the host path for those.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from russell_tpu.ode import constants as C
from russell_tpu.ode.enums import Method

__all__ = ["build_fused_erk_solver"]

EPS = 2.220446049250313e-16


def build_fused_erk_solver(stepper, params):
    """Returns jitted ``solve(x0, y0, x1, h0) -> (y, stats)`` for an
    embedded ERK stepper (ExplicitRungeKutta instance)."""
    info = params.method.information()
    if not info.embedded:
        raise ValueError("the fused ERK solver requires an embedded method")
    f = stepper.system.function
    A, B, Cc, E = stepper.A, stepper.B, stepper.Cc, stepper.E
    nstage = stepper.nstage
    method = params.method
    abs_tol, rel_tol = params.tol.abs, params.tol.rel
    lund_factor = stepper.lund_factor
    lund_beta = params.erk.lund_beta
    m_safety = params.step.m_safety
    m_first_reject = params.step.m_first_reject
    d_min, d_max = stepper.d_min, stepper.d_max
    rel_error_prev_min = params.step.rel_error_prev_min
    n_step_max = params.step.n_step_max
    fsal = info.first_step_same_as_last
    ndim = stepper.system.ndim

    def stages(x, y, h, k0):
        ks = [k0]
        for i in range(1, nstage):
            vi = y
            for j in range(i):
                a = A[i, j]
                if a != 0.0:
                    vi = vi + (h * a) * ks[j]
            ks.append(f(x + h * Cc[i], vi, None))
        w = y
        for i in range(nstage):
            if B[i] != 0.0:
                w = w + (B[i] * h) * ks[i]
        sk = abs_tol + rel_tol * jnp.maximum(jnp.abs(y), jnp.abs(w))
        if method == Method.DOPRI8:
            err_a = jnp.zeros_like(y)
            err_b = jnp.zeros_like(y)
            for i in range(nstage):
                if B[i] != 0.0:
                    err_a = err_a + B[i] * ks[i]
                if E[i] != 0.0:
                    err_b = err_b + E[i] * ks[i]
            err_a = (err_a - C.DOPRI8_BHH1 * ks[0] - C.DOPRI8_BHH2 * ks[8]
                     - C.DOPRI8_BHH3 * ks[11])
            err_3 = jnp.sum((err_a / sk) ** 2)
            err_5 = jnp.sum((err_b / sk) ** 2)
            den = jnp.where(err_5 + 0.01 * err_3 <= 0.0, 1.0,
                            err_5 + 0.01 * err_3)
            rel = jnp.abs(h) * err_5 * jnp.sqrt(1.0 / (ndim * den))
        else:
            err_m = jnp.zeros_like(y)
            for i in range(nstage):
                if E[i] != 0.0:
                    err_m = err_m + (E[i] * h) * ks[i]
            rel = jnp.maximum(jnp.sqrt(jnp.sum((err_m / sk) ** 2) / ndim),
                              1e-10)
        return jnp.stack(ks), w, rel

    def solve(x0, y0, x1, h0):
        dtype = jnp.asarray(y0).dtype
        y0 = jnp.asarray(y0, dtype=dtype)
        x0 = jnp.asarray(x0, dtype=dtype)
        x1 = jnp.asarray(x1, dtype=dtype)
        h0 = jnp.asarray(h0, dtype=dtype)
        state = {
            "x": x0, "y": y0, "h_new": h0,
            "k_last": jnp.zeros(ndim, dtype=dtype),
            "have_k": jnp.zeros((), jnp.bool_),
            "rel_error": jnp.zeros((), dtype),
            "rel_error_prev": jnp.asarray(rel_error_prev_min, dtype),
            "follows_reject": jnp.zeros((), jnp.bool_),
            "last_step": jnp.zeros((), jnp.bool_),
            "status": jnp.zeros((), jnp.int32),
            "n_steps": jnp.zeros((), jnp.int32),
            "n_accepted": jnp.zeros((), jnp.int32),
            "n_rejected": jnp.zeros((), jnp.int32),
            "n_function": jnp.zeros((), jnp.int32),
            "iter_count": jnp.zeros((), jnp.int32),
        }

        def cond(s):
            return (s["status"] == 0) & (s["iter_count"] < n_step_max)

        def body(s):
            s = {**s, "iter_count": s["iter_count"] + 1}
            dx = x1 - s["x"]
            done_conv = dx <= 10.0 * EPS
            h = jnp.minimum(s["h_new"], dx)
            too_small = (h <= 10.0 * EPS) & ~done_conv

            def finish(s):
                return {**s, "status": jnp.where(done_conv, 1, 2)
                        .astype(jnp.int32)}

            def step(s):
                # k0: fresh unless FSAL-reusable (erk.rs:164-167)
                fresh = ((s["n_accepted"] == 0) | (not fsal)) \
                    & (~s["follows_reject"]) | (~s["have_k"])
                k0 = lax.cond(fresh, lambda _: f(s["x"], s["y"], None),
                              lambda _: s["k_last"], None)
                nfcn = s["n_function"] + jnp.where(fresh, 1, 0) \
                    + (nstage - 1)
                ks, w, rel = stages(s["x"], s["y"], h, k0)
                n_steps = s["n_steps"] + 1

                def accept(_):
                    # dopri5.f lines 463-467
                    fac = rel ** lund_factor
                    if lund_beta > 0.0:
                        fac = fac / s["rel_error_prev"] ** lund_beta
                    fac = jnp.clip(fac / m_safety, d_max, d_min)
                    h_new = h / fac
                    h_new = jnp.where(s["follows_reject"],
                                      jnp.minimum(h_new, h), h_new)
                    x_new = s["x"] + h
                    k_last = ks[nstage - 1] if fsal else ks[0]
                    last = x_new + h_new >= x1
                    return {**s, "x": x_new, "y": w, "h_new": h_new,
                            "k_last": k_last,
                            "have_k": jnp.ones((), jnp.bool_),
                            "rel_error": rel,
                            "rel_error_prev": jnp.maximum(
                                rel_error_prev_min, rel),
                            "follows_reject": jnp.zeros((), jnp.bool_),
                            "last_step": last,
                            "status": jnp.where(s["last_step"], 1,
                                                s["status"]),
                            "n_steps": n_steps,
                            "n_accepted": s["n_accepted"] + 1,
                            "n_function": nfcn}

                def reject(_):
                    d = rel ** lund_factor / m_safety
                    h_new = jnp.where(
                        (s["n_accepted"] == 0) & (m_first_reject > 0.0),
                        h * m_first_reject, h / jnp.minimum(d_min, d))
                    return {**s, "h_new": h_new, "rel_error": rel,
                            "k_last": ks[0],
                            "have_k": jnp.ones((), jnp.bool_),
                            "follows_reject": jnp.ones((), jnp.bool_),
                            "last_step": jnp.zeros((), jnp.bool_),
                            "n_steps": n_steps,
                            "n_rejected": s["n_rejected"] + jnp.where(
                                s["n_accepted"] > 0, 1, 0),
                            "n_function": nfcn}

                return lax.cond(rel < 1.0, accept, reject, None)

            return lax.cond(done_conv | too_small, finish, step, s)

        out = lax.while_loop(cond, body, state)
        stats = {k: out[k] for k in ("status", "n_steps", "n_accepted",
                                     "n_rejected", "n_function")}
        stats["h_accepted"] = out["h_new"]
        return out["y"], stats

    return jax.jit(solve)
