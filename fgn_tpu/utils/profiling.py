"""Profiling / tracing helpers.

The reference hand-rolls wall-clock scalars to TensorBoard (SURVEY.md
§5.1: Time/TrainStep, Time/TrainEpoch, Time/Evaluation — kept by the
Runner). This module adds the device-side story the reference lacks:
``jax.profiler`` traces viewable in TensorBoard's profile plugin or
Perfetto."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace for the duration of the block."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Exponential-moving-average step timer with block_until_ready
    semantics for accurate device timing."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema_ms: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = (time.perf_counter() - self._t0) * 1000.0
        self.ema_ms = (
            dt if self.ema_ms is None
            else self.alpha * dt + (1 - self.alpha) * self.ema_ms
        )
        return dt
