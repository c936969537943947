"""Profiling / tracing helpers.

The reference has no tracing at all (SURVEY §5); these are the cheap
TPU-native wins: jax.profiler traces around train windows and a
per-step timing meter that respects async dispatch (sync via a scalar
pull, since on some tunneled platforms block_until_ready returns before
execution completes — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vqacl_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing with periodic hard syncs."""

    def __init__(self, sync_every: int = 10):
        self.sync_every = sync_every
        self.times: List[float] = []
        self._count = 0
        self._t0 = time.perf_counter()

    def step(self, sync_value=None) -> None:
        """Call once per train step; pass a device scalar (e.g. the loss)
        to force execution every ``sync_every`` steps."""
        self._count += 1
        if self._count % self.sync_every == 0:
            if sync_value is not None:
                float(sync_value)
            t1 = time.perf_counter()
            self.times.append((t1 - self._t0) / self.sync_every)
            self._t0 = t1

    @property
    def ms_per_step(self) -> float:
        if not self.times:
            return 0.0
        tail = self.times[max(1, len(self.times) // 2):] or self.times
        return 1e3 * sum(tail) / len(tail)

    def summary(self) -> Dict[str, float]:
        return {"ms_per_step": self.ms_per_step,
                "steps": self._count}
