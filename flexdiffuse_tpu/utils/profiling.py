"""Profiling & phase timing (SURVEY.md §5: replace wall-clock prints).

The reference's only timing is a per-batch wall clock that clobbers the DDIM
η field (utils.py:72,92,103). Here: structured per-phase timers plus an
optional ``jax.profiler`` trace context for TensorBoard-grade TPU profiles.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

log = logging.getLogger(__name__)


class PhaseTimer:
    """Accumulating named-phase timer.

    >>> timer = PhaseTimer()
    >>> with timer.phase('encode'): ...
    >>> timer.summary()  # {'encode': {'total_s': ..., 'count': ...}}
    """

    def __init__(self) -> None:
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._totals[name] += dt
            self._counts[name] += 1
            log.debug('phase %s: %.3fs', name, dt)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                'total_s': self._totals[name],
                'count': self._counts[name],
                'mean_s': self._totals[name] / max(self._counts[name], 1),
            }
            for name in self._totals
        }

    def reset(self) -> None:
        self._totals.clear()
        self._counts.clear()


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """``jax.profiler`` trace context; no-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info('profiler trace written to %s', log_dir)
