"""Profiling and throughput instrumentation.

The reference has no tracing at all (SURVEY §5) — only tqdm bars and
coarse wall-clock prints.  Here throughput is a first-class metric (the
benchmark is clips/sec/chip), so:

* :func:`trace` wraps a stage in a ``jax.profiler.TraceAnnotation`` (shows
  up in TensorBoard/XProf traces) and records host-side wall time;
* :class:`StageTimes` aggregates per-stage seconds and derives
  clips/sec;
* :func:`profile_to` captures a full device trace for offline analysis
  (``tensorboard --logdir`` or xprof).
"""

from __future__ import annotations

import collections
import contextlib
import time

import jax


class StageTimes:
    def __init__(self):
        self.seconds: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self.seconds[name] += time.perf_counter() - t0
                self.counts[name] += items

    def throughput(self, name: str) -> float:
        sec = self.seconds.get(name, 0.0)
        return self.counts.get(name, 0) / sec if sec > 0 else 0.0

    def summary(self) -> dict:
        return {
            name: {
                "seconds": round(self.seconds[name], 4),
                "items": self.counts[name],
                "items_per_sec": round(self.throughput(name), 4),
            }
            for name in self.seconds
        }


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a device trace into ``logdir`` for xprof/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield
