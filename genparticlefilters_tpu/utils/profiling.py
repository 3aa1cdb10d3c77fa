"""Profiling hooks (SURVEY.md §5: reference has none; TPU build uses the
JAX profiler / xprof)."""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace_profile", "Timer"]


@contextlib.contextmanager
def trace_profile(logdir: str):
    """Capture an xprof trace of the enclosed block (view with
    TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that forces completion via a host fetch of the
    given result pytree (over remote backends ``block_until_ready`` may not
    synchronize; a host fetch always does)."""

    def __init__(self):
        self.elapsed = None
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self._t0

    def stop(self, result=None):
        if result is not None:
            import numpy as np
            np.asarray(jax.tree_util.tree_leaves(result)[0]).ravel()[:1]
        self.elapsed = time.time() - self._t0
        return self.elapsed
