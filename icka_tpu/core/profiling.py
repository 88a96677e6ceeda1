"""Profiling and tracing hooks.

The reference has no profiler integration at all (SURVEY.md §5); here
tracing is first-class: named-scope annotations around every pipeline stage
(visible in XProf/TensorBoard), a `trace` context manager for capturing
device traces, and a lightweight step timer for throughput accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


def annotate(name: str):
    """Decorator/context: mark a region in device traces."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a device trace into `log_dir` (view with xprof/TensorBoard).
    No-op when log_dir is None so call sites can leave it wired in."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock throughput accounting with compile-step exclusion."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self._seen = 0
        self._t0 = None
        self._steps = 0
        self._items = 0

    def step(self, n_items: int = 1):
        self._seen += 1
        if self._seen <= self.skip_first:
            return
        if self._t0 is None:
            self._t0 = time.perf_counter()
            return
        self._steps += 1
        self._items += n_items

    @property
    def items_per_sec(self) -> float:
        if self._t0 is None or self._steps == 0:
            return 0.0
        return self._items / (time.perf_counter() - self._t0)
