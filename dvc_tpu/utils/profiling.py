"""Tracing / profiling / numerics debugging (SURVEY.md §5 aux subsystems).

The reference's machinery is two ad-hoc wall-time decorators plus a broken
`utils.profiler` import and an always-on `torch.autograd.set_detect_anomaly`
(model/disentangled_vae.py:313).  TPU-native equivalents:
  * trace(): context manager around `jax.profiler` producing a TensorBoard-
    loadable trace of device execution;
  * StepTimer: host-side step statistics (mean/std ms, like the encoder
    loop's visdom timing at encoder/visualizations.py:114-117);
  * debug_nans(): opt-in jax_debug_nans scope — the sanitizer the reference
    hardwires, gated behind a flag as SURVEY.md §5 prescribes.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile viewable in TensorBoard (plugin 'profile')."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped NaN checking (replaces the reference's permanent
    set_detect_anomaly — see model/disentangled_vae.py:313)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Rolling per-step wall-time statistics."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: list[float] = []
        self._last: float | None = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_ms(self) -> float:
        return 1000.0 * float(np.mean(self._times)) if self._times else 0.0

    @property
    def std_ms(self) -> float:
        return 1000.0 * float(np.std(self._times)) if self._times else 0.0

    def summary(self) -> str:
        return f"{self.mean_ms:.1f} ± {self.std_ms:.1f} ms/step"
