"""Profiling and throughput observability.

TPU-native replacement for the reference's wall-clock-only timing
(demo.py:73-120, ADMMLSTMS process_time checkpoints): `jax.profiler` trace
capture around training sections, named trace annotations, and a simple
iterations/s meter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

from admm_lstm_tpu.utils.logging import info


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)
    around a code block; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        info(f'Profiler trace written to {log_dir}')


def annotate(name: str):
    """Named trace annotation for a region (shows up in the profile)."""
    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Iterations/s over a sliding window; call update() once per step."""

    def __init__(self, window: int = 100) -> None:
        self.window = window
        self._times: list = []
        self.total = 0

    def update(self) -> None:
        self.total += 1
        now = time.perf_counter()
        self._times.append(now)
        if len(self._times) > self.window:
            self._times.pop(0)

    @property
    def iters_per_s(self) -> float:
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else 0.0

    def report(self, prefix: str = '') -> None:
        info(f'{prefix}throughput: {self.iters_per_s:.1f} iters/s '
             f'({self.total} total)')
