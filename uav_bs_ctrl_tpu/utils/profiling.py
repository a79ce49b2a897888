"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5 — only a wall-clock ``Time`` column).
This module adds:

- ``trace(logdir)``            — context manager around ``jax.profiler`` trace
  capture (viewable in TensorBoard / Perfetto).
- ``annotate(name)``           — ``jax.profiler.TraceAnnotation`` wrapper for
  host-side phases (env stepping, batch assembly, update dispatch).
- ``StepTimer``                — lightweight EMA timers for per-phase wall
  clock, dumped into the EpochLogger.
"""

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(logdir, enabled=True):
    """Capture a jax.profiler trace into ``logdir`` while the block runs."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named trace annotation (shows up on the host timeline)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates per-phase wall-clock; reports mean ms since last flush."""

    def __init__(self):
        self._acc = defaultdict(float)
        self._cnt = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._cnt[name] += 1

    def flush(self, prefix="Time"):
        """Return {f'{prefix}{Phase}Ms': mean_ms} and reset."""
        out = {}
        for name, total in self._acc.items():
            n = max(self._cnt[name], 1)
            out[f"{prefix}{name}Ms"] = 1e3 * total / n
        self._acc.clear()
        self._cnt.clear()
        return out
