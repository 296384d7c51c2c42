"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count=8`` (no TPU pod needed, per the
reference-free distributed test strategy in SURVEY.md §4/§7). Tests require
float64 to reproduce the reference's double-precision oracles.
"""

import os
import sys

# Must be set before jax is imported anywhere. Note: the harness environment
# pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must run on local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
# tests simulate whole-program compile rejections; keep those out of the
# real cross-process probe cache (.jax_cache/genmf_whole_probe.json)
_probe = f"/tmp/russell_tpu_test_probe_{os.getpid()}.json"
os.environ["RUSSELL_TPU_PROBE_CACHE"] = _probe
try:  # stale rejections (previous or CONCURRENT runs) must not leak in
    os.remove(_probe)
except OSError:
    pass
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The harness sitecustomize registers a remote-TPU ("axon") PJRT plugin and
# pins jax_platforms="axon,cpu"; re-pin to local CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
