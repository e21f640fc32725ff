"""Profiling hooks: jax.profiler traces + lightweight stage timers.

The reference has no profiler integration (SURVEY.md §5); the TPU-native
equivalent is a jax.profiler trace around the serving loop plus the
per-stage wall timings already collected by StreamHealth / BatcherStats.

Usage:
    realtime-analytics --config c.yaml --jax-profile /tmp/trace
    # then: tensorboard --logdir /tmp/trace  (or xprof)
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def jax_trace(logdir: Optional[str]) -> Iterator[None]:
    """Wrap a region in a jax.profiler trace when a logdir is given."""
    if not logdir:
        yield
        return
    import jax

    logger.info("jax.profiler trace -> %s", logdir)
    with jax.profiler.trace(logdir):
        yield


class StageTimer:
    """Accumulating wall-clock timer for named pipeline stages."""

    def __init__(self) -> None:
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._sums[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def snapshot(self) -> Dict[str, dict]:
        return {
            name: {
                "calls": self._counts[name],
                "total_s": round(self._sums[name], 4),
                "avg_ms": round(self._sums[name] / self._counts[name] * 1e3, 3),
            }
            for name in self._sums
        }

    def reset(self) -> None:
        self._sums.clear()
        self._counts.clear()
