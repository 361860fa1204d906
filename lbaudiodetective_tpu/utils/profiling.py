"""Tracing / profiling hooks (SURVEY §5: the reference has none; the bench
harness and serving paths use these).

- ``stage(name)``: context manager adding both a host-side wall-clock span
  and a ``jax.profiler.TraceAnnotation`` so device traces group by pipeline
  stage (decode / extract / match / stream).
- ``trace_to(dir)``: capture a profiler trace (perfetto-compatible) around a
  block, when the backend supports it.
- ``StageTimers``: accumulates per-stage wall times; the bench harness
  reports them as the structured metrics replacing the reference's NSLog
  result dictionaries (LBAudioDetectiveTests.m:90).
"""

from __future__ import annotations

import collections
import contextlib
import time

import jax


class StageTimers:
    def __init__(self):
        self.totals = collections.defaultdict(float)
        self.counts = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self.totals[name] += time.perf_counter() - t0
                self.counts[name] += 1

    def report(self) -> dict:
        return {name: {"seconds": self.totals[name], "calls": self.counts[name]}
                for name in sorted(self.totals)}


_GLOBAL = StageTimers()


def stage(name: str):
    """Module-level convenience: ``with profiling.stage("extract"): ...``"""
    return _GLOBAL.stage(name)


def report() -> dict:
    return _GLOBAL.report()


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a device trace around the block (no-op if unsupported)."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
