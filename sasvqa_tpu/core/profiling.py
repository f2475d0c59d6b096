"""Tracing / profiling harness (SURVEY.md §5.1).

The reference has no profiler (only a never-called Timer,
preprocessing/datautils/utils.py:118-140, and tqdm bars).  This module
provides the TPU-native equivalents:

- ``Timer``: tic/toc wall-clock averaging (same API shape as the
  reference's, so ported scripts keep working);
- ``StepTimer``: per-stage step-time meters with EMA + percentiles;
- ``trace`` / ``annotate``: jax.profiler wrappers (TraceAnnotation shows
  up in xprof timelines; ``trace`` captures a full device profile dir);
- ``synced``: robust device synchronisation for timing loops — fetches a
  scalar to host instead of ``block_until_ready`` (which misbehaves
  under the axon TPU tunnel; see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


class Timer:
    """tic/toc averaging timer."""

    def __init__(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average: bool = True) -> float:
        self.diff = time.time() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff


def synced(x: Any) -> Any:
    """Force device completion by fetching ONE SCALAR per leaf's
    computation to host.

    The slice happens ON DEVICE before the fetch — device_get of a full
    leaf would drag the whole array (150 MB for flagship logits) over
    the tunnel, corrupting the very timings this helper exists to keep
    honest.  Every leaf is touched because independent dispatches
    complete independently: syncing only the first leaf would let
    others still be in flight.  Meant for small step-output trees —
    each leaf costs a host round-trip (~34 ms tunneled), so don't pass
    a full params tree."""
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(leaf.ravel()[:1])
    return x


class StepTimer:
    """Per-stage wall-clock meters: use ``with step_timer.stage("data"):``.

    ``summary()`` -> {stage: {mean_ms, p50_ms, p95_ms, count}}.
    """

    def __init__(self, max_samples: int = 1000):
        self._samples: Dict[str, list] = defaultdict(list)
        self._max = max_samples

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            samples = self._samples[name]
            samples.append(time.perf_counter() - t0)
            if len(samples) > self._max:
                del samples[: len(samples) - self._max]

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, samples in self._samples.items():
            arr = np.asarray(samples) * 1e3
            out[name] = dict(mean_ms=float(arr.mean()),
                             p50_ms=float(np.percentile(arr, 50)),
                             p95_ms=float(np.percentile(arr, 95)),
                             count=len(arr))
        return out


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler device trace into log_dir (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
