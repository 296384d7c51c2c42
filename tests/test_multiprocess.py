"""Real multi-PROCESS execution over jax.distributed (CPU simulation).

SURVEY.md §4 prescribes validating multi-host behavior with jax's
multi-process simulation on CPU: two OS processes, each owning 4 virtual
CPU devices, joined through ``initialize_multihost`` (the DCN-analog
process group) into one 8-device global mesh. Collectives then cross the
process boundary over gRPC — the code path a TPU pod would use across
hosts, which single-process virtual meshes never exercise.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.environ["RUSSELL_REPO"])
from russell_tpu.parallel import initialize_multihost, make_mesh

pid = int(sys.argv[1])
port = sys.argv[2]
initialize_multihost(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

mesh = make_mesh(8)
sharding = NamedSharding(mesh, P("rows"))
host = np.arange(8.0, dtype=np.float32)
garr = jax.make_array_from_callback((8,), sharding, lambda idx: host[idx])

# cross-process psum through shard_map (the DCN collective path)
fn = jax.jit(shard_map(lambda v: lax.psum(v, "rows"), mesh=mesh,
                       in_specs=P("rows"), out_specs=P()))
out = fn(garr)
val = float(np.asarray(out.addressable_data(0)))
assert val == 28.0, val

# cross-process all_gather: every process reconstructs the global vector
# (check_vma off: the gathered result is replicated by construction but
# the static checker cannot prove it)
fn2 = jax.jit(shard_map(lambda v: lax.all_gather(v, "rows", tiled=True),
                        mesh=mesh, in_specs=P("rows"), out_specs=P(),
                        check_vma=False))
full = np.asarray(fn2(garr).addressable_data(0))
assert np.array_equal(full, host), full

# ---- REAL product kernels across the process boundary -------------------
# (VERDICT r2: the cross-process code path of the actual factorizations
# was untested). Same f32 absolute-residual contract as the driver's
# dryrun_multichip.
from russell_tpu.parallel import (dist_gridmf_factorize, dist_gridmf_solve,
                                  dist_splu_factorize)
from russell_tpu.sparse import samples as _ssamples
from russell_tpu.sparse import gridmf as _gridmf, splu as _splu

coo = _ssamples.laplacian_2d(16)
i2, j2, v2 = coo.triplets()
n = coo.nrow
repl = NamedSharding(mesh, P())
v32 = v2.astype(np.float32)
rhs_h = np.linspace(1.0, 2.0, n, dtype=np.float32)
gvals = jax.make_array_from_callback(v32.shape, repl, lambda idx: v32[idx])
grhs = jax.make_array_from_callback(rhs_h.shape, repl, lambda idx: rhs_h[idx])
rows_c = jnp.asarray(i2)
cols_c = jnp.asarray(j2)
vals_c = jnp.asarray(v32)
rhs_c = jnp.asarray(rhs_h)

@jax.jit
def resid_inf(x):
    ax = jax.ops.segment_sum(vals_c * x[cols_c], rows_c, num_segments=n)
    return jnp.max(jnp.abs(ax - rhs_c))

# distributed GRIDMF factorize+solve: node batch axis sharded over the
# 8-device (2-process) mesh — extend-add crosses the process boundary at
# the top depths
plan4 = _gridmf.gridmf_analyze(n, np.asarray(i2), np.asarray(j2),
                               (16, 16, 1), leaf_cells=4)
fac4 = dist_gridmf_factorize(mesh, plan4, gvals)
x4 = dist_gridmf_solve(mesh, plan4, fac4, grhs)
r4 = float(resid_inf(x4))
assert r4 < 1e-3, f"dist GRIDMF cross-process residual {r4}"

# distributed SPLU: level chunks split over the mesh, psum-combined
plan3 = _splu.splu_analyze(n, np.asarray(i2), np.asarray(j2),
                           block_size=16, ordering="nd")
fac3 = dist_splu_factorize(mesh, plan3, gvals)
x3 = jax.jit(lambda f, b: _splu.splu_solve(plan3, f, b))(fac3, grhs)
r3 = float(resid_inf(x3))
assert r3 < 1e-3, f"dist SPLU cross-process residual {r3}"
print(f"proc {pid} ok")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_jax_distributed(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ, RUSSELL_REPO=REPO, PYTHONPATH=REPO)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} ok" in out
