"""GENMF TPU microbenchmark: the general-matrix multifrontal on a
Raj1-class irregular operator (random-geometric graph; the reference's
circuit/FEM benchmark class, russell_sparse/data/logs/Raj1_MUMPS.json:
n=263,743, MUMPS factorize 81.8 ms / cuDSS 15.1 ms).

Sweeps leaf_target (class count vs flops tradeoff: smaller leaves mean
more, smaller batched classes — bigger XLA programs but fewer flops).
Each configuration runs in its OWN SUBPROCESS with a hard timeout (the
attached TPU worker kills long device calls and takes 15-40 min to
recover), same discipline as tools/bench_gridmf.py.

Usage:
    python tools/bench_genmf.py                     # default sweep
    python tools/bench_genmf.py --n 263743 --leaf 256   # one config
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_one(n: int, leaf: int, cpu: bool = False) -> None:
    import numpy as np
    import jax

    if cpu:  # sitecustomize pins the axon TPU; re-pin via jax.config
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from russell_tpu.sparse import genmf, samples

    coo = samples.irregular_geometric(n, seed=0)
    ii = coo.indices_i[:coo.nnz]
    jj = coo.indices_j[:coo.nnz]
    vv = coo.values[:coo.nnz]

    t = time.perf_counter()
    plan = genmf.genmf_analyze(n, ii, jj, leaf_target=leaf)
    t_analyze = time.perf_counter() - t

    vals = jnp.asarray(vv.astype(np.float32))
    b = jnp.asarray(np.linspace(1.0, 2.0, n).astype(np.float32))
    # stepped per-class drivers: the whole-program graph aborts the
    # attached backend's fusion emitter (see sparse/genmf.py notes)
    fact = lambda d: genmf.genmf_factorize_steps(plan, d)
    solve = lambda f, v: genmf.genmf_solve_steps(plan, f, v)

    t = time.perf_counter()
    fac = jax.block_until_ready(fact(vals))
    cold_f = time.perf_counter() - t
    t = time.perf_counter()
    fac = jax.block_until_ready(fact(vals))
    warm_f = time.perf_counter() - t

    t = time.perf_counter()
    x = jax.block_until_ready(solve(fac, b))
    cold_s = time.perf_counter() - t
    t = time.perf_counter()
    x = jax.block_until_ready(solve(fac, b))
    warm_s = time.perf_counter() - t

    # f32 residual sanity (no refinement here; factor.py adds it)
    r = (jnp.zeros(n, jnp.float32)
         .at[jnp.asarray(ii)].add(vals * x[jnp.asarray(jj)])) - b
    resid = float(jnp.max(jnp.abs(r)))

    d = plan.stats_dict()
    print(json.dumps({
        "n": n, "nnz": int(coo.nnz), "leaf": leaf,
        "n_classes": d["n_classes"], "n_fronts": d["n_fronts"],
        "flops": d["flops"], "store_f32_gb": d["store_f32_gb"],
        "t_analyze_s": round(t_analyze, 2),
        "fact_cold_s": round(cold_f, 3),
        "fact_warm_s": round(warm_f, 4),
        "fact_gflops_warm": round(d["flops"] / warm_f / 1e9, 1),
        "solve_cold_s": round(cold_s, 3),
        "solve_warm_s": round(warm_s, 4),
        "resid_f32": resid,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int)
    ap.add_argument("--leaf", type=int, default=256)
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.n:
        run_one(args.n, args.leaf, cpu=args.cpu)
        return

    # small config first: bounds the compile-size risk before Raj1 scale
    sweep = [(30000, 256), (263743, 256), (263743, 96)]
    for n, leaf in sweep:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--n", str(n), "--leaf", str(leaf)]
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=args.timeout)
            tail = (out.stdout.strip().splitlines() or ["(no output)"])[-1]
            print(tail if out.returncode == 0 else
                  json.dumps({"n": n, "leaf": leaf,
                              "error": (out.stderr or "?").strip()[-300:]}),
                  flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"n": n, "leaf": leaf, "error": "timeout"}),
                  flush=True)


if __name__ == "__main__":
    main()
