"""Tracing / profiling / throughput counters.

The reference has no profiling beyond wall-clock wandb scalars (SURVEY.md
§5.1).  This module adds:

* ``trace(logdir)`` — ``jax.profiler`` trace capture (XProf/TensorBoard
  viewable) around any code block;
* ``Stopwatch`` — correct device timing on this stack (``block_until_ready``
  is not a reliable barrier through the axon tunnel: a scalar host fetch is);
* ``ThroughputMeter`` — tokens/s, audio-seconds/s, steps/s counters for the
  BASELINE "audio-seconds/sec/chip" metric.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str, perfetto: bool = False):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard.
    ``perfetto=True`` additionally writes a plain-JSON perfetto trace
    (machine-parseable without the TensorBoard profile plugin)."""
    jax.profiler.start_trace(logdir, create_perfetto_trace=perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> float:
    """Force device completion by fetching a scalar reduction to host.
    Returns the fetched value (ignorable)."""
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    l = leaves[0]
    if jnp.issubdtype(l.dtype, jnp.floating) or jnp.issubdtype(l.dtype, jnp.integer):
        return float(jnp.sum(l.astype(jnp.float32)))
    return float(np.asarray(l).sum())


class Stopwatch:
    """Wall-clock timer with a device-sync on stop."""

    def __init__(self):
        self.t0 = None
        self.elapsed = 0.0

    def start(self):
        self.t0 = time.time()
        return self

    def stop(self, result=None) -> float:
        if result is not None:
            sync(result)
        self.elapsed = time.time() - self.t0
        return self.elapsed


@dataclass
class ThroughputMeter:
    """Accumulates work done vs wall time; reports the BASELINE metrics."""

    frame_rate: int = 86
    tokens: int = 0
    frames: int = 0
    steps: int = 0
    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start(self):
        self._t0 = time.time()
        return self

    def add(self, *, steps: int = 0, frames: int = 0, tokens: int = 0, result=None):
        if result is not None:
            sync(result)
        now = time.time()
        self.seconds += now - self._t0
        self._t0 = now
        self.steps += steps
        self.frames += frames
        self.tokens += tokens

    def report(self) -> dict:
        s = max(self.seconds, 1e-9)
        return {
            "steps_per_sec": self.steps / s,
            "tokens_per_sec": self.tokens / s,
            "audio_seconds_per_sec": self.frames / self.frame_rate / s,
            "wall_seconds": self.seconds,
        }
