"""Tracing and profiling utilities.

The reference has no profiler hooks (SURVEY §5). Here: jax.profiler trace
capture around training steps, named step annotations, and a lightweight
wall-clock step timer whose output feeds the edges/sec north-star metric.

NOTE on tunneled/remote TPU platforms: ``block_until_ready`` may return
before device work completes; :func:`device_sync` forces a real sync by
fetching a scalar reduction to the host. All timing helpers here use it.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp


def device_sync(x: Any) -> float:
    """Force completion of everything ``x`` depends on; returns the fetched
    scalar (sum of the first float leaf)."""
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    return float(jnp.asarray(leaves[0]).astype(jnp.float32).sum())


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Rolling wall-clock step timing with true device syncs every
    ``sync_every`` steps (syncing every step would serialize dispatch)."""

    sync_every: int = 10
    _t0: float = field(default=0.0)
    _steps: int = 0
    _times: list = field(default_factory=list)
    _pending: Any = None

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, result: Any = None) -> None:
        self._steps += 1
        self._pending = result
        if self._steps % self.sync_every == 0:
            device_sync(self._pending)
            now = time.perf_counter()
            self._times.append((self.sync_every, now - self._t0))
            self._t0 = now

    def steps_per_sec(self) -> float:
        if not self._times:
            return float("nan")
        n = sum(c for c, _ in self._times)
        t = sum(t for _, t in self._times)
        return n / t if t > 0 else float("nan")

    def summary(self, edges_per_step: int | None = None, depth: int = 1) -> dict:
        sps = self.steps_per_sec()
        out = {"steps_per_sec": sps}
        if edges_per_step:
            out["edges_per_sec"] = sps * edges_per_step * depth
        return out
