"""Device/backend control: the TPU-native analog of the reference's BLAS
thread control (russell_lab/examples/base_auxiliary_blas.rs
set_num_threads/get_num_threads -> device enumeration + mesh shaping)."""
import _prelude  # noqa: F401
import jax
import numpy as np

print("backend:", jax.default_backend())
print("device count:", jax.device_count())
print("devices:", jax.devices())
# the lab's get_num_threads analog: how much parallelism XLA sees
assert jax.device_count() >= 1
x = jax.numpy.ones(1024)
assert float(x.sum()) == 1024.0
print("device control OK")
