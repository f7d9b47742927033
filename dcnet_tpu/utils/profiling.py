"""Profiling / tracing utilities.

The reference has no tracing beyond wall-clock AverageMeters
(`/root/reference/train_DCNet.py:564-565,694-695`; SURVEY.md §5). TPU-native
replacement: jax.profiler trace annotations + a device-trace capture helper,
plus a StepTimer that works around this deployment's quirk where
`block_until_ready` can return before remote execution finishes (see
bench.py) by chaining on a fetched scalar.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import numpy as np


@contextlib.contextmanager
def trace_annotation(name: str) -> Iterator[None]:
    """Named region in the device trace (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = trace_annotation


class StepTimer:
    """Wall-clock step timing that forces completion via a host fetch of a
    tiny array from the step output. Use `with timer.step(out_scalar):`."""

    def __init__(self) -> None:
        self.times = []

    @contextlib.contextmanager
    def step(self) -> Iterator[dict]:
        box = {}
        t0 = time.perf_counter()
        yield box
        if "sync" in box:
            np.asarray(box["sync"])
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        arr = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {"mean_s": float(arr.mean()), "p50_s": float(np.median(arr)),
                "p90_s": float(np.percentile(arr, 90)), "n": int(arr.size)}
