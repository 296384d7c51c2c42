"""Auxiliary subsystems: checkpoint/resume and profiling.

SURVEY.md §5.4: the reference has no solver checkpointing (persistence is
serde JSON of results; resume = re-run solve from saved (x, y)); a
checkpoint of the stepper state is the natural TPU-native addition.
§5.1: tracing hooks around jax.profiler complement the Stopwatch-based
stats schema.
"""

from russell_tpu.utils.checkpoint import CheckpointManager
from russell_tpu.utils.profiling import trace

__all__ = ["CheckpointManager", "trace"]
