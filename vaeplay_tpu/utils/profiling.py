"""Tracing / profiling — the reference has none (SURVEY.md §5); here every
trainer can capture an XLA/TPU profile and per-step wall timings.

  with maybe_profile("/tmp/trace", enabled=args.profile):
      ... training loop ...

writes a TensorBoard-compatible trace (xplane) via jax.profiler.  StepTimer
keeps a lightweight host-side moving window of step latencies without forcing
device syncs (call .lap() after a host sync point such as metric fetches).
"""

import contextlib
import time
from collections import deque
from typing import Optional

import jax


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str], enabled: bool = True):
    if trace_dir and enabled:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class StepTimer:
    def __init__(self, window: int = 50):
        self._laps = deque(maxlen=window)
        self._t = time.perf_counter()

    def lap(self, n_items: int = 1) -> None:
        now = time.perf_counter()
        self._laps.append((now - self._t, n_items))
        self._t = now

    def reset(self) -> None:
        self._t = time.perf_counter()

    @property
    def items_per_sec(self) -> float:
        if not self._laps:
            return 0.0
        dt = sum(d for d, _ in self._laps)
        n = sum(i for _, i in self._laps)
        return n / dt if dt > 0 else 0.0

    @property
    def sec_per_step(self) -> float:
        if not self._laps:
            return 0.0
        return sum(d for d, _ in self._laps) / len(self._laps)
