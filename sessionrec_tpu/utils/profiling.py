"""Profiling hooks (SURVEY.md §5: the reference has none — wall-clock
prints only, train.py:88,106-107; the TPU build adds ``jax.profiler``
traces and a per-step timing context).
"""

from __future__ import annotations

import contextlib
import time

import jax

from sessionrec_tpu.utils.logging import get_logger

log = get_logger(__name__)


@contextlib.contextmanager
def trace(log_dir):
    """Capture a ``jax.profiler`` trace (TensorBoard/Perfetto-viewable)
    of everything inside the block.  No-op when ``log_dir`` is falsy."""
    if not log_dir:
        yield
        return
    log.info("profiling to %s", log_dir)
    with jax.profiler.trace(str(log_dir)):
        yield
    log.info("wrote profiler trace to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (shows up in the profiler UI)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Cheap wall-clock step timer; records (name, dt) pairs."""

    def __init__(self):
        self.records = []

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        yield
        self.records.append((name, time.perf_counter() - t0))

    def summary(self):
        out = {}
        for name, dt in self.records:
            tot, n = out.get(name, (0.0, 0))
            out[name] = (tot + dt, n + 1)
        return {k: {"total_s": t, "count": n, "mean_s": t / n}
                for k, (t, n) in out.items()}
