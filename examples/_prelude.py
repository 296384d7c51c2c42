"""Shared example setup: local CPU + f64 (the reference's oracle regime).

Pins the platform BEFORE any backend query — calling
``jax.default_backend()`` here would initialize the harness's remote
"axon" TPU plugin (hanging when the worker is unreachable and silently
disabling the f64 oracle regime)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))
if "axon" not in (jax.config.jax_platforms or "") and \
        "tpu" not in (jax.config.jax_platforms or ""):
    jax.config.update("jax_enable_x64", True)
