"""Tracing & step-timing utilities (the aux subsystem the reference lacks;
SURVEY.md §5: only wall-clock deltas existed there).

- ``profile_trace``: context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory (set SVTSG_TRACE_DIR or pass a path).
- ``StepTimer``: async-dispatch-aware step timing — on remote-TPU relays
  ``block_until_ready`` returns at enqueue, so timing must fence with a
  host fetch of a scalar; the timer does that every ``sync_every`` steps
  and attributes the elapsed window to the steps inside it.
- ``log_compile_time``: wraps a jitted call to report its first-call
  (compile) cost separately from steady-state.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str]):
    """jax.profiler trace when a directory is given; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _fence(value: Any) -> None:
    """Force device completion by fetching one scalar to the host."""
    leaf = None
    import jax
    for x in jax.tree_util.tree_leaves(value):
        leaf = x
        break
    if leaf is not None:
        np.asarray(jax.device_get(leaf))


class StepTimer:
    """Throughput accounting with periodic device fences.

    Usage:
        timer = StepTimer(sync_every=16)
        for batch in loader:
            out = step(...)
            timer.tick(out, items=batch_size)
        stats = timer.finish(out)
    """

    def __init__(self, sync_every: int = 16):
        self.sync_every = sync_every
        self._count = 0
        self._items = 0
        self._window_items = 0
        self._t0 = time.perf_counter()
        self._window_t0 = self._t0
        self.window_rates: List[float] = []

    def tick(self, out: Any, items: int = 1) -> Optional[float]:
        self._count += 1
        self._items += items
        self._window_items += items
        if self._count % self.sync_every == 0:
            _fence(out)
            now = time.perf_counter()
            rate = self._window_items / (now - self._window_t0)
            self.window_rates.append(rate)
            self._window_t0 = now
            self._window_items = 0
            return rate
        return None

    def finish(self, out: Any) -> Dict[str, float]:
        _fence(out)
        total = time.perf_counter() - self._t0
        return {
            'steps': self._count,
            'items': self._items,
            'seconds': total,
            'items_per_sec': self._items / total if total > 0 else 0.0,
            'peak_window_rate': max(self.window_rates) if self.window_rates else 0.0,
        }


def log_compile_time(fn: Callable, *args, **kwargs):
    """Call fn once, fencing, and return (result, seconds) — the first call
    of a jitted function reports compile+first-run time."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    _fence(out)
    return out, time.perf_counter() - t0
