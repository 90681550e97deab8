"""Tracing / profiling hooks.

The reference's only instrumentation is wall-clock RTF accounting
(infer.py:284-288, vits_wrap.py:91-99). Here profiling is first-class:
`jax.profiler` trace capture around training/serving regions, per-step
audio-seconds and step-time counters, and honest device timing through a full
host round-trip (the axon relay acks before compute completes, so
block_until_ready alone under-reports).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (TensorBoard-viewable) if log_dir set."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn, *args, iters: int = 5, warmup: int = 1):
    """Median wall time of fn(*args) with a device_get round-trip per call."""
    for _ in range(warmup):
        jax.device_get(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.time()
        jax.device_get(fn(*args))
        times.append(time.time() - t0)
    return float(np.median(times))


class StepMeter:
    """Rolling throughput meter: steps/s and audio-seconds/s."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._steps = 0
        self._audio_sec = 0.0

    def update(self, audio_sec: float = 0.0, steps: int = 1):
        self._steps += steps
        self._audio_sec += audio_sec

    def rates(self):
        dt = max(time.time() - self._t0, 1e-9)
        return {"steps_per_s": self._steps / dt,
                "audio_sec_per_s": self._audio_sec / dt,
                "elapsed_s": dt}
