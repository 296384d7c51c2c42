"""Profiling hooks (SURVEY.md §5.1).

The Stopwatch/stats schema covers the reference's nanosecond timers;
``trace`` adds device-level visibility through jax.profiler (the TPU
answer to criterion microbenchmarks + OpenMP thread timers).
"""

from __future__ import annotations

import contextlib

__all__ = ["trace"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager around jax.profiler.trace; view with TensorBoard or
    xprof. Falls back to a no-op if the profiler is unavailable."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
