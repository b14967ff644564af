'''Tracing / profiling hooks (the reference has only wall-clock prints —
captioning_utils.py:33-42; here: jax.profiler traces + step timers).'''
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    '''Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)
    around the enclosed block. No-op when log_dir is None.'''
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    '''Rolling per-step wall-clock stats with device sync on demand.'''

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None and self.count % self.sync_every == 0:
            jax.block_until_ready(result)
        self.total += time.perf_counter() - self._t0
        self.count += 1

    @property
    def mean_ms(self) -> float:
        return 1000.0 * self.total / max(self.count, 1)


def annotate(name: str):
    '''Named trace region (shows up in the profiler timeline).'''
    return jax.profiler.TraceAnnotation(name)
