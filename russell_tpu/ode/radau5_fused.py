"""Fully-fused Radau5 variable-step solver: ONE device computation for the
whole integration.

The host-controlled stepper (radau5.py) is bit-faithful to radau5.f but
pays one device round trip per kernel call — fatal when the chip is remote
(SURVEY.md P5 analog: the reference pays FFI calls, we pay dispatches).
This module traces the ENTIRE variable-step loop of ode_solver.rs:278-366
plus Radau5::step/accept/reject into a single ``lax.while_loop``:
stepsize controller, simplified-Newton iteration with divergence
prediction, Gustafsson predictive controller, Jacobian/factorization reuse
policy, and the statistics counters — all as traced state. The returned
counters follow the same update rules as the host path (validated against
it in tests/test_ode.py).

Dense output IS supported in-fused (reference contract:
russell_ode/src/radau5.rs:669 collocation polynomial + output.rs:269-285
stations): pass ``dense_x`` (a static, sorted station grid including the
endpoints) and the while_loop carries an ``(n_out, ndim)`` station buffer,
scattering the collocation polynomial of each accepted step into the
stations it covers — the exact same arithmetic as the host path's
``Radau5.dense_output``. Callbacks/file-writing are played back by the
driver AFTER the device computation (they cannot run mid-trace); a
callback that returns True stops the playback, not the integration.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from russell_tpu.ode.constants import radau5_constants

__all__ = ["build_fused_solver"]

_R5 = radau5_constants()
EPS = 2.220446049250313e-16


def build_fused_solver(stepper, params, chunk=None, dense_x=None):
    """Returns ``solve(x0, y0, x1, h0) -> (y, stats_dict)`` closed over a
    Radau5 stepper's kernels (structure-frozen plan).

    ``dense_x`` (optional): static sorted station grid INCLUDING x0 and
    x1 (the Output.initialize layout). The state then carries
    ``dense_y (n_out, ndim)`` + ``dense_h (n_out,)`` buffers: station 0
    is filled with y0 at init, interior stations are scattered on each
    accepted step from the collocation polynomial (identical arithmetic
    to Radau5.dense_output), and the LAST station is left for the driver
    to fill with the final y (output.rs `last()` contract). Memory cost
    is n_out*ndim*8 bytes carried in HBM — size stations accordingly.

    ``chunk`` bounds the number of outer steps per DEVICE CALL: the
    attached TPU's worker kills single executions that run for minutes,
    so on TPU the integration runs as a short host loop over a jitted
    while_loop that carries the complete solver state (counters are
    bit-identical; the only cost is one scalar sync per chunk). The cap
    is ADAPTIVE: it lives in the traced state (no recompiles) and the
    host loop re-sizes it each call from the measured per-step wall time
    to target ~25 s per device call — big problems auto-shrink to 1-2
    steps/call, small ones grow to amortize the sync. ``chunk=None`` ->
    initial cap 4 on TPU (RUSSELL_TPU_FUSED_CHUNK overrides the initial
    value), unchunked elsewhere; ``chunk=0`` forces a single device call
    (the vmappable form solve_batch needs)."""
    system = stepper.system
    plan = stepper.plan
    ndim = system.ndim
    f = system.function
    jac_fn = stepper._jac_fn
    has_mass = stepper._has_mass
    mass_vv = jnp.asarray(stepper._mass_vv)
    mass_ii = jnp.asarray(stepper._mass_ii)
    mass_jj = jnp.asarray(stepper._mass_jj)
    numerical = stepper._numerical

    from russell_tpu.sparse import factor as _factor

    A, B, G = _R5["ALPHA"], _R5["BETA"], _R5["GAMMA"]
    T, TI, C = _R5["T"], _R5["TI"], _R5["C"]
    E0, E1, E2 = _R5["E0"], _R5["E1"], _R5["E2"]
    MU1, MU2, MU3 = _R5["MU1"], _R5["MU2"], _R5["MU3"]
    MU4, MU5 = _R5["MU4"], _R5["MU5"]

    abs_tol = params.tol.abs
    rel_tol = params.tol.rel
    tol_newton = params.tol.newton
    nit = params.newton.n_iteration_max
    m_min, m_max = params.step.m_min, params.step.m_max
    m_safety = params.step.m_safety
    m_first_reject = params.step.m_first_reject
    rel_error_prev_min = params.step.rel_error_prev_min
    n_step_max = params.step.n_step_max
    theta_max = params.radau5.theta_max
    c1h, c2h = params.radau5.c1h, params.radau5.c2h
    use_pred = params.radau5.use_pred_control
    zero_trial = params.radau5.zero_trial
    jac_extra = ndim if numerical else 0

    def mass_mat_vec(w):
        return jax.ops.segment_sum(mass_vv * w[mass_jj], mass_ii,
                                   num_segments=ndim)

    mixed = plan.mixed32
    # Newton corrections tolerate inexact solves (see radau5.py)
    _nr = 1 if mixed else 0

    import os as _os
    if chunk is None:
        chunk = (int(_os.environ.get("RUSSELL_TPU_FUSED_CHUNK", "4"))
                 if jax.default_backend() == "tpu" else 0)
    chunked = bool(chunk and chunk > 0)
    chunk_cap0 = chunk if chunked else params.step.n_step_max
    # wall-clock target per device call; the worker kills ~60 s runs
    chunk_target_s = float(_os.environ.get("RUSSELL_TPU_FUSED_TARGET_S",
                                           "25.0"))

    with_dense = dense_x is not None
    if with_dense:
        dense_x_np = np.asarray(dense_x, dtype=np.float64)
        n_out = dense_x_np.shape[0]
        if n_out < 2:
            raise ValueError("dense_x must include x0 and x1")
        # the last station is filled by the driver with the final y
        # (output.rs last()); it must never be written by the scatter
        _dense_scatter_ok = np.arange(n_out) < n_out - 1

    def factorize(jv, h, dtype):
        alpha, beta, gamma = A / h, B / h, G / h
        cdtype = (jnp.complex64 if (mixed or dtype != jnp.float64)
                  else jnp.complex128)
        data_r = jnp.concatenate([-jv, gamma * mass_vv.astype(dtype)])
        data_c = jnp.concatenate([
            -jv.astype(cdtype),
            (alpha + 1j * beta) * mass_vv.astype(cdtype)])
        # SPLU factorizes both in ONE scan over the packed schedule (P5)
        return _factor.numeric_factorize_pair(plan, data_r, data_c)

    def newton_once(x, y, h, w, z, fac_r, fac_c, scaling):
        alpha, beta, gamma = A / h, B / h, G / h
        u = x + jnp.asarray(C, dtype=y.dtype) * h
        k0 = f(u[0], y + z[0], None)
        k1 = f(u[1], y + z[1], None)
        k2 = f(u[2], y + z[2], None)
        if has_mass:
            l0, l1, l2 = (mass_mat_vec(w[0]), mass_mat_vec(w[1]),
                          mass_mat_vec(w[2]))
        else:
            l0, l1, l2 = w[0], w[1], w[2]
        r0 = TI[0, 0] * k0 + TI[0, 1] * k1 + TI[0, 2] * k2 - gamma * l0
        r1 = (TI[1, 0] * k0 + TI[1, 1] * k1 + TI[1, 2] * k2
              - alpha * l1 + beta * l2)
        r2 = (TI[2, 0] * k0 + TI[2, 1] * k1 + TI[2, 2] * k2
              - beta * l1 - alpha * l2)
        if mixed:
            rc = r1.astype(jnp.float32) + 1j * r2.astype(jnp.float32)
        else:
            rc = r1 + 1j * r2
        # real + complex solves share one substitution pass for SPLU
        dw0, dw12 = _factor.factor_solve_pair(plan, fac_r, fac_c, r0, rc,
                                              refine_steps=_nr)
        w0 = w[0] + dw0
        w1 = w[1] + jnp.real(dw12)
        w2 = w[2] + jnp.imag(dw12)
        wn = jnp.stack([w0, w1, w2])
        zn = jnp.stack([
            T[0, 0] * w0 + T[0, 1] * w1 + T[0, 2] * w2,
            T[1, 0] * w0 + T[1, 1] * w1 + T[1, 2] * w2,
            T[2, 0] * w0 + T[2, 1] * w1 + T[2, 2] * w2])
        ldw = jnp.sqrt((jnp.sum((dw0 / scaling) ** 2)
                        + jnp.sum((jnp.real(dw12) / scaling) ** 2)
                        + jnp.sum((jnp.imag(dw12) / scaling) ** 2))
                       / (3.0 * ndim))
        return wn, zn, ldw

    def newton_loop(x, y, h, w, z, fac_r, fac_c, scaling, eta0):
        """Simplified-Newton iteration (radau5.f 914-975) as a while_loop."""
        def cond(st):
            return (~st["done"]) & (st["newt"] < nit)

        def body(st):
            newt = st["newt"] + 1
            w, z, ldw = newton_once(x, y, h, st["w"], st["z"], fac_r, fac_c,
                                    scaling)
            st = {**st, "w": w, "z": z, "newt": newt,
                  "nfcn": st["nfcn"] + 3, "nsol": st["nsol"] + 1}
            is_later = (newt > 1) & (newt < nit)
            thq = ldw / jnp.maximum(st["ldw_old"], 1e-300)
            theta_new = jnp.where(newt == 2, thq,
                                  jnp.sqrt(thq * st["thq_old"]))
            theta = jnp.where(is_later, theta_new, st["theta"])
            thq_old = jnp.where(is_later, thq, st["thq_old"])
            ok_theta = theta < 0.99
            eta = jnp.where(is_later & ok_theta, theta / (1.0 - theta),
                            st["eta"])
            expo = jnp.asarray(nit - 1, dtype=ldw.dtype) - newt
            rel_err = eta * ldw * theta ** expo / tol_newton
            q_newt = jnp.clip(rel_err, 1e-4, 20.0)
            den = 4.0 + (nit - 1) - newt
            h_mult_div = 0.8 * q_newt ** (-1.0 / den)
            diverging = is_later & ((ok_theta & (rel_err >= 1.0))
                                    | (~ok_theta))
            h_mult = jnp.where(is_later & ~ok_theta, 0.5,
                               jnp.where(diverging, h_mult_div,
                                         st["h_mult"]))
            converged = eta * ldw < tol_newton
            done = diverging | converged
            return {**st, "theta": theta, "thq_old": thq_old, "eta": eta,
                    "ldw_old": ldw, "h_mult": h_mult,
                    "diverging": diverging, "converged": converged,
                    "done": done}

        dtype = y.dtype
        st0 = {"w": w, "z": z, "newt": jnp.zeros((), jnp.int32),
               "theta": jnp.asarray(theta_max, dtype),
               "eta": jnp.maximum(eta0, EPS) ** 0.8,
               "ldw_old": jnp.zeros((), dtype),
               "thq_old": jnp.zeros((), dtype),
               "h_mult": jnp.ones((), dtype),
               "diverging": jnp.zeros((), jnp.bool_),
               "converged": jnp.zeros((), jnp.bool_),
               "done": jnp.zeros((), jnp.bool_),
               "nfcn": jnp.zeros((), jnp.int32),
               "nsol": jnp.zeros((), jnp.int32)}
        return lax.while_loop(cond, body, st0)

    def err_estimate(z, k_acc, h, fac_r, scaling, x, y, first_or_reject,
                     nfcn):
        gamma = G / h
        ez = E0 * z[0] + E1 * z[1] + E2 * z[2]
        mez = gamma * (mass_mat_vec(ez) if has_mass else ez)
        err = _factor.factor_solve(plan, fac_r, mez + k_acc,
                                   refine_steps=_nr)
        rel = jnp.maximum(1e-10,
                          jnp.sqrt(jnp.sum((err / scaling) ** 2) / ndim))

        def second(_):
            fpe = f(x, y + err, None)
            err2 = _factor.factor_solve(plan, fac_r, mez + fpe,
                                        refine_steps=_nr)
            rel2 = jnp.maximum(
                1e-10, jnp.sqrt(jnp.sum((err2 / scaling) ** 2) / ndim))
            return rel2, nfcn + 1

        redo = (rel >= 1.0) & first_or_reject
        rel, nfcn = lax.cond(redo, second, lambda _: (rel, nfcn), None)
        return rel, nfcn

    def _make_state(x0, y0, x1, h0):
        dtype = jnp.asarray(y0).dtype
        y0 = jnp.asarray(y0, dtype=dtype)
        x0 = jnp.asarray(x0, dtype=dtype)
        x1 = jnp.asarray(x1, dtype=dtype)
        h0 = jnp.asarray(h0, dtype=dtype)

        jv0 = jac_fn(x0, y0, None)

        zero3 = jnp.zeros((3, ndim), dtype=dtype)
        state = {
            "x1": x1, "chunk_steps": jnp.zeros((), jnp.int32),
            "chunk_cap": jnp.asarray(chunk_cap0, jnp.int32),
            "x": x0, "y": y0, "h_new": h0, "h_prev": h0,
            "rel_error": jnp.zeros((), dtype),
            "rel_error_prev": jnp.asarray(rel_error_prev_min, dtype),
            "follows_reject": jnp.zeros((), jnp.bool_),
            "last_step": jnp.zeros((), jnp.bool_),
            "eta": jnp.ones((), dtype),
            "jac_computed": jnp.zeros((), jnp.bool_),
            "reuse_jac": jnp.zeros((), jnp.bool_),
            "reuse_fact": jnp.zeros((), jnp.bool_),
            "jv": jv0, "h_fact": h0,
            "k_acc": jnp.zeros(ndim, dtype=dtype),
            "scaling": jnp.ones(ndim, dtype=dtype),
            "yc": zero3,
            "status": jnp.zeros((), jnp.int32),  # 0 running 1 ok 2 h 3 nwt
            "n_steps": jnp.zeros((), jnp.int32),
            "n_accepted": jnp.zeros((), jnp.int32),
            "n_rejected": jnp.zeros((), jnp.int32),
            "n_function": jnp.zeros((), jnp.int32),
            "n_jacobian": jnp.zeros((), jnp.int32),
            "n_factor": jnp.zeros((), jnp.int32),
            "n_lin_sol": jnp.zeros((), jnp.int32),
            "n_iterations": jnp.zeros((), jnp.int32),
            "n_iterations_max": jnp.zeros((), jnp.int32),
            "iter_count": jnp.zeros((), jnp.int32),
        }
        if with_dense:
            # station 0 = (x0, y0) with the initial h (output.rs:423
            # first-execute record)
            state["dense_y"] = (jnp.zeros((n_out, ndim), dtype=dtype)
                                .at[0].set(y0))
            state["dense_h"] = (jnp.zeros((n_out,), dtype=dtype)
                                .at[0].set(h0))
        return state

    def cond(s):
        return ((s["status"] == 0) & (s["iter_count"] < n_step_max)
                & (s["chunk_steps"] < s["chunk_cap"]))

    def body(s):
        s = {**s, "iter_count": s["iter_count"] + 1,
             "chunk_steps": s["chunk_steps"] + 1}
        dx = s["x1"] - s["x"]
        done_conv = dx <= 10.0 * EPS
        h = jnp.minimum(s["h_new"], dx)
        too_small = (h <= 10.0 * EPS) & ~done_conv

        def finish(s):
            st = jnp.where(done_conv, 1, jnp.where(too_small, 2,
                                                   s["status"]))
            return {**s, "status": st}

        def step(s):
            s = {**s, "n_steps": s["n_steps"] + 1}
            first = s["n_accepted"] == 0
            # initialize on first-accepted phase (radau5.rs:186)
            scaling = jnp.where(first,
                                abs_tol + rel_tol * jnp.abs(s["y"]),
                                s["scaling"])
            k_acc = lax.cond(first,
                             lambda _: f(s["x"], s["y"], None),
                             lambda _: s["k_acc"], None)
            nfcn = s["n_function"] + jnp.where(first, 1, 0)

            # jacobian + factorization (with reuse policy). The
            # factorization itself is recomputed every step at the
            # carried h_fact — numerically identical to reusing the
            # stored factors, but keeps the (large) factorization
            # buffers out of the while-loop carry (HBM pressure)
            def new_jac(_):
                return jac_fn(s["x"], s["y"], None), jnp.ones(
                    (), jnp.int32)

            def old_jac(_):
                return s["jv"], jnp.zeros((), jnp.int32)

            jv, njac = lax.cond(
                s["reuse_fact"] | s["reuse_jac"] | s["jac_computed"],
                old_jac, new_jac, None)
            nfac = jnp.where(s["reuse_fact"], 0, 1).astype(jnp.int32)
            h_fact = jnp.where(s["reuse_fact"], s["h_fact"], h)
            fac_r, fac_c = factorize(jv, h_fact, s["y"].dtype)
            jac_computed = s["jac_computed"] | (njac > 0)
            nfcn = nfcn + njac * jac_extra

            # trial values (radau5.rs:367)
            def trial_poly(_):
                c3q = h / s["h_prev"]
                c1q = MU1 * c3q
                c2q = MU2 * c3q
                yc = s["yc"]

                def poly(cq):
                    return cq * (yc[0] + (cq - MU4)
                                 * (yc[1] + (cq - MU3) * yc[2]))

                z = jnp.stack([poly(c1q), poly(c2q), poly(c3q)])
                w = jnp.stack([
                    TI[0, 0] * z[0] + TI[0, 1] * z[1] + TI[0, 2] * z[2],
                    TI[1, 0] * z[0] + TI[1, 1] * z[1] + TI[1, 2] * z[2],
                    TI[2, 0] * z[0] + TI[2, 1] * z[1] + TI[2, 2] * z[2]])
                return z, w

            zero3b = jnp.zeros((3, ndim), dtype=s["y"].dtype)
            z0, w0 = lax.cond(first | zero_trial,
                              lambda _: (zero3b, zero3b), trial_poly, None)

            nst = newton_loop(s["x"], s["y"], h, w0, z0, fac_r, fac_c,
                              scaling, s["eta"])
            nfcn = nfcn + nst["nfcn"]
            nsol = s["n_lin_sol"] + nst["nsol"]
            n_it = nst["newt"]
            n_it_max = jnp.maximum(s["n_iterations_max"], n_it)
            eta = nst["eta"]
            theta = nst["theta"]

            def diverged(_):
                return {**s, "n_function": nfcn, "n_lin_sol": nsol,
                        "n_iterations": n_it,
                        "scaling": scaling, "k_acc": k_acc,
                        "jv": jv, "h_fact": h_fact,
                        "jac_computed": jac_computed, "eta": eta,
                        "n_jacobian": s["n_jacobian"] + njac,
                        "n_factor": s["n_factor"] + nfac,
                        # the host consumes BOTH reuse flags at step start
                        # (radau5.py step); a retry must recompute J unless
                        # jac_computed says it is already fresh at (x, y)
                        "reuse_fact": jnp.zeros((), jnp.bool_),
                        "reuse_jac": jnp.zeros((), jnp.bool_),
                        "follows_reject": jnp.ones((), jnp.bool_),
                        "last_step": jnp.zeros((), jnp.bool_),
                        "h_new": h * nst["h_mult"]}

            def not_converged(_):
                return {**s, "status": jnp.asarray(3, jnp.int32),
                        "n_function": nfcn, "n_lin_sol": nsol,
                        "n_iterations": n_it,
                        "n_iterations_max": n_it_max,
                        "n_jacobian": s["n_jacobian"] + njac,
                        "n_factor": s["n_factor"] + nfac}

            def converged(_):
                z = nst["z"]
                rel, nfcn2 = err_estimate(
                    z, k_acc, h, fac_r, scaling, s["x"], s["y"],
                    first | s["follows_reject"], nfcn)

                def accept(_):
                    y_new = s["y"] + z[2]
                    yc0 = (z[1] - z[2]) / MU4
                    yc1 = ((z[0] - z[1]) / MU5 - yc0) / MU3
                    yc2 = yc1 - ((z[0] - z[1]) / MU5 - z[0] / MU1) / MU2
                    yc = jnp.stack([yc0, yc1, yc2])
                    n_acc = s["n_accepted"] + 1
                    num = m_safety * (1 + 2 * nit)
                    den = n_it + 2 * nit
                    facv = jnp.minimum(m_safety, num / den)
                    div = jnp.clip(rel ** 0.25 / facv, m_min, m_max)
                    h_new = h / div
                    if use_pred:
                        r2 = rel * rel
                        rp = s["rel_error_prev"]
                        fac_g = jnp.clip(
                            (s["h_prev"] / h) * (r2 / rp) ** 0.25
                            / m_safety, m_min, m_max)
                        div2 = jnp.maximum(div, fac_g)
                        h_new = jnp.where(n_acc > 1, h / div2, h_new)
                    h_ratio = h_new / h
                    reuse_fact = ((theta <= theta_max)
                                  & (h_ratio >= c1h) & (h_ratio <= c2h))
                    reuse_jac = (~reuse_fact) & (theta <= theta_max)
                    h_new_eff = jnp.where(reuse_fact, s["h_new"], h_new)
                    # do not let h grow after a reject
                    h_new_eff = jnp.where(
                        s["follows_reject"],
                        jnp.minimum(h_new_eff, h), h_new_eff)
                    x_new = s["x"] + h
                    scal2 = abs_tol + rel_tol * jnp.abs(y_new)
                    k_acc2 = f(x_new, y_new, None)
                    last = x_new + h_new_eff >= s["x1"]
                    dense_upd = {}
                    if with_dense:
                        xs = jnp.asarray(dense_x_np, dtype=y_new.dtype)
                        # the host records station i the first time
                        # x_out <= x holds after an accept (output.rs:269);
                        # with the identical step sequence that is exactly
                        # (x_old < x_out <= x_new)
                        mask = ((xs > s["x"]) & (xs <= x_new)
                                & jnp.asarray(_dense_scatter_ok))
                        srel = (xs - x_new) / h  # in [-1, 0]
                        pol = (y_new[None, :]
                               + srel[:, None]
                               * (yc[0][None, :]
                                  + (srel[:, None] - MU4)
                                  * (yc[1][None, :]
                                     + (srel[:, None] - MU3)
                                     * yc[2][None, :])))
                        dense_upd["dense_y"] = jnp.where(
                            mask[:, None], pol, s["dense_y"])
                        dense_upd["dense_h"] = jnp.where(
                            mask, h, s["dense_h"])
                    return {**s, **dense_upd,
                            "x": x_new, "y": y_new, "yc": yc,
                            "h_prev": h, "h_new": h_new_eff,
                            "rel_error": rel,
                            "rel_error_prev": jnp.maximum(
                                rel_error_prev_min, rel),
                            "follows_reject": jnp.zeros((), jnp.bool_),
                            "last_step": last,
                            "eta": eta,
                            "jac_computed": jnp.zeros((), jnp.bool_),
                            "reuse_jac": reuse_jac,
                            "reuse_fact": reuse_fact,
                            "jv": jv, "h_fact": h_fact,
                            "k_acc": k_acc2, "scaling": scal2,
                            "status": jnp.where(
                                s["last_step"], 1, s["status"]),
                            "n_accepted": n_acc,
                            "n_function": nfcn2 + 1,
                            "n_jacobian": s["n_jacobian"] + njac,
                            "n_factor": s["n_factor"] + nfac,
                            "n_lin_sol": nsol,
                            "n_iterations": n_it,
                            "n_iterations_max": n_it_max}

                def reject(_):
                    num = m_safety * (1 + 2 * nit)
                    den = n_it + 2 * nit
                    facv = jnp.minimum(m_safety, num / den)
                    div = jnp.clip(rel ** 0.25 / facv, m_min, m_max)
                    h_new = jnp.where(
                        (s["n_accepted"] == 0) & (m_first_reject > 0.0),
                        h * m_first_reject, h / div)
                    return {**s,
                            "n_rejected": s["n_rejected"] + jnp.where(
                                s["n_accepted"] > 0, 1, 0),
                            "follows_reject": jnp.ones((), jnp.bool_),
                            "last_step": jnp.zeros((), jnp.bool_),
                            "h_new": h_new, "rel_error": rel,
                            "eta": eta,
                            "jv": jv, "h_fact": h_fact,
                            "jac_computed": jac_computed,
                            "reuse_fact": jnp.zeros((), jnp.bool_),
                            "reuse_jac": jnp.zeros((), jnp.bool_),
                            "k_acc": k_acc, "scaling": scaling,
                            "n_function": nfcn2,
                            "n_jacobian": s["n_jacobian"] + njac,
                            "n_factor": s["n_factor"] + nfac,
                            "n_lin_sol": nsol,
                            "n_iterations": n_it,
                            "n_iterations_max": n_it_max}

                return lax.cond(rel < 1.0, accept, reject, None)

            return lax.cond(
                nst["diverging"], diverged,
                lambda _: lax.cond(nst["converged"], converged,
                                   not_converged, None), None)

        return lax.cond(done_conv | too_small, finish, step, s)

    _init_j = jax.jit(_make_state)

    def _run(st):
        st = {**st, "chunk_steps": jnp.zeros((), jnp.int32)}
        return lax.while_loop(cond, body, st)

    _run_j = jax.jit(_run)

    def solve(x0, y0, x1, h0):
        import time as _time
        st = _init_j(x0, y0, x1, h0)
        first_call = True
        while True:
            t0 = _time.perf_counter()
            st = _run_j(st)
            done = (not chunked) or int(st["status"]) != 0 \
                or int(st["iter_count"]) >= n_step_max
            if done:
                break
            # adapt the cap toward the wall-clock target (the first call
            # pays the compile, so its timing is not representative)
            elapsed = _time.perf_counter() - t0
            steps = max(int(st["chunk_steps"]), 1)
            if not first_call and elapsed > 0:
                cap = int(max(1, min(256, chunk_target_s * steps
                                     / elapsed)))
                st = {**st, "chunk_cap": jnp.asarray(cap, jnp.int32)}
            first_call = False
        stats = {k: st[k] for k in
                 ("status", "n_steps", "n_accepted", "n_rejected",
                  "n_function", "n_jacobian", "n_factor", "n_lin_sol",
                  "n_iterations", "n_iterations_max")}
        stats["h_accepted"] = st["h_new"]
        if with_dense:
            stats["dense_y"] = st["dense_y"]
            stats["dense_h"] = st["dense_h"]
            stats["h_prev"] = st["h_prev"]
        return st["y"], stats

    return solve
