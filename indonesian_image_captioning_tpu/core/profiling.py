"""Profiling and step-timing utilities.

The reference's only instrumentation is wall-clock AverageMeters printed
every print_freq batches (utils/metric.py:4-22, trains/attention_scn.py:
196-201,263-271) — kept via train/loop.EpochPrinter.  This module adds the
TPU-native layer: ``jax.profiler`` traces viewable in XProf/TensorBoard and
a lightweight step timer with proper device synchronisation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/iic_tpu_trace"):
    """Capture a jax.profiler trace around a block::

        with profiling.trace("/tmp/trace"):
            step(state, batch)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in the trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timer that blocks on device results.

    Note: on remote-attached devices prefer timing around a small
    ``jax.device_get`` of a real output; ``block_until_ready`` alone can
    return before the remote step retires.
    """

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.time() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[min(int(n * 0.9), n - 1)],
            "min_s": ts[0],
            "max_s": ts[-1],
            "count": n,
        }
