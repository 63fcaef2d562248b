"""Tracing / profiling utilities (SURVEY.md §5.1 — absent in the reference,
which only does wall-clock ETA math, train.py:333,384-391).

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory.
* :class:`StepTimer` — steps/sec and videos/sec counters with tunnel-aware
  synchronization (on the axon TPU tunnel ``block_until_ready`` does not
  block; only output fetches do — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Rolling step-time / throughput counter."""

    batch_size: int = 1
    _t0: float = field(default_factory=time.perf_counter)
    _steps: int = 0

    def step(self, n: int = 1):
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    @property
    def videos_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0


def sync(x):
    """Force true device completion by fetching output bytes (the tunnel's
    ``block_until_ready`` is fire-and-forget)."""
    import jax
    import numpy as np

    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0])
    return x
