"""Profiling / timing / observability utilities.

Counterparts of the reference's vidi_* helpers (SURVEY.md §5):
  vidi::StackTimer / HighPerformanceTimer → StackTimer (context manager)
  vidi::FPSCounter                        → FPSCounter
  util::total_n_bytes_allocated + vnrMemoryQuery → device_memory_report
plus TPU-specific hooks the CUDA code has no analog for: Xprof traces via
jax.profiler (`trace()` context) for kernel-level timing.

IMPORTANT timing note for this stack: through the axon TPU tunnel,
`block_until_ready` can return before device work completes — `sync()`
forces a host readback, the only reliable fence (bench.py relies on this).
"""
from __future__ import annotations

import contextlib
import sys
import time

import jax
import numpy as np


def sync(*arrays):
    """Reliable device fence: host-readback ONE SCALAR per array (every
    leaf of every argument — leaves can come from different dispatches,
    so fencing only the first would let the rest keep running).

    The slice executes on device, so only 4 bytes per leaf cross the
    (slow) tunnel — np.asarray on the full array would ship the buffer."""
    for a in arrays:
        for leaf in jax.tree.leaves(a):
            np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


class StackTimer:
    """with StackTimer("training chunk"): ...  → prints elapsed on exit."""

    def __init__(self, label: str = "", out=sys.stderr, sync_on=None):
        self.label = label
        self.out = out
        self.sync_on = sync_on
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync_on is not None:
            sync(self.sync_on)
        self.elapsed = time.perf_counter() - self.t0
        if self.label:
            print(f"[timer] {self.label}: {self.elapsed*1e3:.2f} ms",
                  file=self.out)
        return False


class FPSCounter:
    """Exponentially smoothed frames/second (vidi::FPSCounter)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self._last = None
        self.fps = 0.0

    def frame(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            inst = 1.0 / max(now - self._last, 1e-9)
            self.fps = (self.alpha * inst + (1 - self.alpha) * self.fps
                        if self.fps else inst)
        self._last = now
        return self.fps


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture an Xprof trace of the enclosed block (view with xprof /
    tensorboard). The TPU answer to the reference's hand-tuned kernel
    timing comments (method_raymarching.cu:43-49)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_memory_report() -> str:
    """Human-readable device memory table (vnrMemoryQueryPrint analog)."""
    lines = []
    for d in jax.devices():
        try:
            m = d.memory_stats() or {}
            use = m.get("bytes_in_use", 0) / 1e9
            peak = m.get("peak_bytes_in_use", 0) / 1e9
            lim = m.get("bytes_limit", 0) / 1e9
            lines.append(f"{d}: {use:.2f} GB in use "
                         f"(peak {peak:.2f} / limit {lim:.2f})")
        except Exception:
            lines.append(f"{d}: memory stats unavailable")
    return "\n".join(lines)
