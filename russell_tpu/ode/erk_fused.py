"""Fully-fused explicit Runge-Kutta variable-step solver.

The ERK analog of radau5_fused: the entire embedded-error-controlled
integration (ode_solver.rs:278-366 + explicit_runge_kutta.rs step/accept/
reject with Lund stabilization) traced into one ``lax.while_loop``.
Counters follow the host path exactly (validated in tests), including
the +3 function evaluations per accepted step that DoPri8 dense output
costs (erk_dense_out.rs / dop853.f a14-a16 rows). Dense STATIONS ride
through the trace like radau5_fused (static sorted grid incl. x0/x1,
masked scatter on accept); step recording / callbacks / stiffness
detection still need the host path.
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


def build_fused_erk_solver(stepper, params, dense_x=None):
    """Returns jitted ``solve(x0, y0, x1, h0) -> (y, stats)`` for an
    embedded ERK stepper (ExplicitRungeKutta instance).

    ``dense_x`` (optional): static sorted station grid INCLUDING x0 and
    x1; the returned stats carry ``dense_y (n_out, ndim)`` + ``dense_h
    (n_out,)`` buffers (station 0 = (x0, y0, h0), interior stations
    filled by the step that first crosses them, the last station left
    for the driver — the same contract as radau5_fused)."""
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

    with_dense = dense_x is not None
    if with_dense:
        if method not in (Method.DOPRI5, Method.DOPRI8):
            raise ValueError("fused ERK dense output requires DoPri5 or "
                             "DoPri8 (erk_dense_out.rs contract)")
        dense_x_np = np.asarray(dense_x, dtype=np.float64)
        n_out = dense_x_np.shape[0]
        if n_out < 2:
            raise ValueError("dense_x must include x0 and x1")
        # interior stations only; first (=x0) pre-filled, last left for
        # the driver's final-y record
        _dense_scatter_ok = np.arange(n_out) < n_out - 1

    def dense_eval(x_old, y, h, w, ks, xs):
        """Continuous-extension values at stations ``xs`` for the step
        (x_old -> x_old+h): the erk_dense_out.py formulas inlined for
        the trace. Returns (pol (n_out, ndim), n_extra_fevals)."""
        theta = ((xs - x_old) / h)[:, None]
        u = 1.0 - theta
        y_diff = w - y
        if method == Method.DOPRI5:
            dd = C.DOPRI5_D
            b_spl = h * ks[0] - y_diff
            d3 = y_diff - h * ks[6] - b_spl
            d4 = h * (dd[0] * ks[0] + dd[2] * ks[2] + dd[3] * ks[3]
                      + dd[4] * ks[4] + dd[5] * ks[5] + dd[6] * ks[6])
            pol = y[None, :] + theta * (
                y_diff[None, :] + u * (
                    b_spl[None, :] + theta * (
                        d3[None, :] + u * d4[None, :])))
            return pol, 0
        dd, aad, ccd = C.DOPRI8_D, C.DOPRI8_AD, C.DOPRI8_CD

        def comb(row, kd_list):
            acc = jnp.zeros_like(y)
            for j in range(12):
                if row[j] != 0.0:
                    acc = acc + row[j] * ks[j]
            if row[12] != 0.0:   # dop853 13th stage = FSAL = k[11]
                acc = acc + row[12] * ks[11]
            for extra, kd in enumerate(kd_list):
                if row[13 + extra] != 0.0:
                    acc = acc + row[13 + extra] * kd
            return acc

        kd = []
        for sx in range(3):
            yd = y + h * comb(aad[sx], kd)
            kd.append(f(x_old + ccd[sx] * h, yd, None))
        b_spl = h * ks[0] - y_diff
        d3 = y_diff - h * ks[11] - b_spl
        drows = [h * comb(dd[r], kd) for r in range(4)]
        par = drows[0][None, :] + theta * (
            drows[1][None, :] + u * (
                drows[2][None, :] + theta * drows[3][None, :]))
        pol = y[None, :] + theta * (
            y_diff[None, :] + u * (
                b_spl[None, :] + theta * (
                    d3[None, :] + u * par)))
        return pol, 3

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
            "x": x0, "y": y0, "h_new": h0, "h_prev": h0,
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
        if with_dense:
            # station 0 = (x0, y0) with the initial h (output.rs:423)
            state["dense_y"] = (jnp.zeros((n_out, ndim), dtype=dtype)
                                .at[0].set(y0))
            state["dense_h"] = (jnp.zeros((n_out,), dtype=dtype)
                                .at[0].set(h0))

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
                    nfcn_a = nfcn
                    dense_upd = {}
                    if with_dense:
                        xs = jnp.asarray(dense_x_np, dtype=w.dtype)
                        # host records station i the first time
                        # x_out <= x holds after an accept (output.rs:269)
                        mask = ((xs > s["x"]) & (xs <= x_new)
                                & jnp.asarray(_dense_scatter_ok))
                        pol, n_extra = dense_eval(s["x"], s["y"], h, w,
                                                  ks, xs)
                        # the host updates the interpolant on EVERY
                        # accepted step (erk.py accept) — DoPri8 pays
                        # its 3 extra stages each time
                        nfcn_a = nfcn + n_extra
                        dense_upd["dense_y"] = jnp.where(
                            mask[:, None], pol, s["dense_y"])
                        dense_upd["dense_h"] = jnp.where(
                            mask, h, s["dense_h"])
                    return {**s, **dense_upd,
                            "x": x_new, "y": w, "h_new": h_new,
                            "h_prev": h,
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
                            "n_function": nfcn_a}

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
                                     "n_rejected", "n_function",
                                     "h_prev")}
        stats["h_accepted"] = out["h_new"]
        if with_dense:
            stats["dense_y"] = out["dense_y"]
            stats["dense_h"] = out["dense_h"]
        return out["y"], stats

    return jax.jit(solve)
