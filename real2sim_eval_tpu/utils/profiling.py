"""Tracing / profiling utilities.

Covers the reference's instrumentation surface (SURVEY.md S5): Warp's
``wp.ScopedTimer`` around physics kernels (spring_mass_warp.py:827-929,
globally disabled at phystwin.py:29) and the per-step FPS prints with
explicit device sync (eval_policy.py:137-138,257-259) — plus a JAX device
trace helper for real profiling (xplane dumps viewable in TensorBoard /
xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class ScopedTimer:
    """Drop-in for wp.ScopedTimer: ``with ScopedTimer('eval_springs'):``.
    Globally disabled by default (as the reference runs); accumulates
    per-label totals when enabled. ``synchronize`` blocks on JAX devices."""

    enabled: bool = False
    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)

    def __init__(self, label: str, synchronize: bool = False, print_each: bool = False):
        self.label = label
        self.synchronize = synchronize
        self.print_each = print_each

    def __enter__(self):
        if ScopedTimer.enabled:
            self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if not ScopedTimer.enabled:
            return False
        if self.synchronize:
            sync_devices()
        dt = time.perf_counter() - self._t0
        ScopedTimer.totals[self.label] += dt
        ScopedTimer.counts[self.label] += 1
        if self.print_each:
            print(f"[timer] {self.label}: {dt * 1000:.2f} ms")
        return False

    @classmethod
    def report(cls) -> str:
        lines = [f"{k}: {v * 1000:.1f} ms total / {cls.counts[k]} calls"
                 for k, v in sorted(cls.totals.items())]
        return "\n".join(lines)

    @classmethod
    def reset(cls):
        cls.totals.clear()
        cls.counts.clear()


def sync_devices():
    """The torch.cuda.synchronize() equivalent for timing boundaries."""
    import jax

    (jax.device_put(0.0) + 0).block_until_ready()


@contextlib.contextmanager
def device_trace(log_dir: str = "log/trace"):
    """Capture a device profile around a block:

        with device_trace('log/trace'):
            step(...)

    View with tensorboard / xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step FPS meter matching the entry points' prints
    (eval_policy.py:257-259)."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self._t0 = None

    def start(self):
        if self.sync:
            sync_devices()
        self._t0 = time.perf_counter()

    def stop(self) -> tuple[float, float]:
        if self.sync:
            sync_devices()
        dt = time.perf_counter() - self._t0
        return dt, 1.0 / max(dt, 1e-9)
