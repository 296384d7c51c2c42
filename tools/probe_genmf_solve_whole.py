"""Targeted probe: does the WHOLE-program GENMF solve jit compile at
benchmark scale? (The whole-fact jit is SIGKILLed by the server
compiler at 264k; the solve graph is far smaller and unlocks the
200x stepped-solve latency win measured at n=30k.)

    python tools/probe_genmf_solve_whole.py [n] [leaf]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_enable_x64", True)
os.makedirs(os.path.join(ROOT, ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 263743
    leaf = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    from russell_tpu.sparse import samples, genmf

    coo = samples.irregular_geometric(n)
    ii = np.asarray(coo.indices_i[:coo.nnz])
    jj = np.asarray(coo.indices_j[:coo.nnz])
    vv = np.asarray(coo.values[:coo.nnz])
    t0 = time.perf_counter()
    plan = genmf.genmf_analyze(n, ii, jj, leaf_target=leaf)
    print(f"analyze {time.perf_counter()-t0:.1f}s "
          f"classes={len(plan.classes)}", flush=True)

    vals32 = jnp.asarray(vv.astype(np.float32))
    b32 = jnp.asarray(np.ones(n, np.float32))
    t0 = time.perf_counter()
    fac = jax.block_until_ready(genmf.genmf_factorize_steps(plan, vals32))
    print(f"stepped fact (cold-ish): {time.perf_counter()-t0:.1f}s",
          flush=True)

    pd = {k: jnp.asarray(v) for k, v in genmf.whole_params(plan).items()}
    jf = jax.jit(lambda cls, b, P: genmf.genmf_solve(
        plan, {"classes": cls}, b, params=P))
    t0 = time.perf_counter()
    try:
        x = jax.block_until_ready(jf(fac["classes"], b32, pd))
        print(f"WHOLE-SOLVE COMPILED+RAN: {time.perf_counter()-t0:.1f}s "
              "cold", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"WHOLE-SOLVE REJECTED after {time.perf_counter()-t0:.1f}s: "
              f"{type(ex).__name__}: {str(ex)[:200]}", flush=True)
        return
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        x = jax.block_until_ready(jf(fac["classes"], b32, pd))
        times.append(time.perf_counter() - t0)
    print(f"whole solve warm: {min(times):.4f}s "
          f"(x3: {', '.join(f'{t:.3f}' for t in times)})", flush=True)
    r = (jnp.zeros(n, jnp.float32)
         .at[jnp.asarray(ii)].add(vals32 * x[jnp.asarray(jj)])) - b32
    print(f"f32 resid: {float(jnp.max(jnp.abs(r))):.3e}", flush=True)


if __name__ == "__main__":
    main()
