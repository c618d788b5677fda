"""Lightweight stage tracing for the pipeline.

The reference's only observability is a verbose spinner and stderr stats
(SURVEY.md §5). The TPU pipeline has real stages worth timing — host decode,
device dispatch per bucket, host encode — so this provides:

  * `stage(name)` — context manager accumulating wall time per stage into a
    thread-local trace, retrievable with `snapshot()`;
  * `device_trace(path)` — wraps `jax.profiler.trace` when a profile dump is
    requested (PNGLOSS_PROFILE_DIR env or explicit path), a no-op otherwise.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict

_local = threading.local()


def _times() -> dict[str, float]:
    if not hasattr(_local, "times"):
        _local.times = defaultdict(float)
        _local.counts = defaultdict(int)
    return _local.times


@contextlib.contextmanager
def stage(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _times()[name] += time.perf_counter() - t0
        _local.counts[name] += 1


def snapshot(reset: bool = False) -> dict[str, dict[str, float]]:
    """Per-stage {'seconds', 'calls'} accumulated on this thread."""
    times = _times()
    out = {k: {"seconds": round(v, 6), "calls": _local.counts[k]}
           for k, v in times.items()}
    if reset:
        times.clear()
        _local.counts.clear()
    return out


@contextlib.contextmanager
def device_trace(path: str | None = None):
    """jax.profiler.trace wrapper; no-op unless a dump dir is configured."""
    path = path or os.environ.get("PNGLOSS_PROFILE_DIR")
    if not path:
        yield
        return
    import jax

    with jax.profiler.trace(path):
        yield
