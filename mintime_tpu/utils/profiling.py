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


def op_stats(trace_dir: str, top: int = 20) -> list[dict]:
    """Per-op device time from a :func:`trace` capture, via xprof.

    Returns the ``top`` ops by total self-time as dicts with keys
    ``name``, ``type``, ``self_ms``, ``flop_rate_gs``, ``bw_gbs``,
    ``bound_by`` — the tool that found the depthwise-conv and
    attention-layout bottlenecks documented in PARITY.md. Requires the
    ``xprof``/``tensorboard_plugin_profile`` package (baked in this image);
    raises ImportError otherwise.
    """
    import glob
    import json

    from xprof.convert import raw_to_tool_data as r2t

    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    # a reused trace_dir accumulates one subdir per capture; mixing runs
    # makes the converter bail — keep only the newest capture
    newest = max(f.rsplit("/", 2)[1] for f in files)
    files = [f for f in files if f.rsplit("/", 2)[1] == newest]
    data, _ = r2t.xspace_to_tool_data(files, "framework_op_stats", {})
    d = json.loads(data.decode() if isinstance(data, bytes) else data)
    table = d[0] if isinstance(d, list) else d
    cols = [c["label"] for c in table["cols"]]
    idx = {label: i for i, label in enumerate(cols)}
    def col(c, label):
        i = idx.get(label)
        return c[i] if i is not None else None

    out = []
    for r in table["rows"]:
        c = [x.get("v") for x in r["c"]]
        out.append(
            {
                "name": c[idx["Operation Name"]],
                "type": c[idx["Operation Type"]],
                "self_ms": (c[idx["Total self-time (us)"]] or 0) / 1e3,
                "flop_rate_gs": col(c, "Model FLOP Rate (GFLOP/s)"),
                "bw_gbs": col(c, "Measured Memory BW (GBytes/Sec)"),
                "bound_by": col(c, "Bound by"),
            }
        )
    out.sort(key=lambda o: -o["self_ms"])
    return out[:top]
