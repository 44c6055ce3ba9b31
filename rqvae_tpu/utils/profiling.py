"""Step-windowed trace capture (jax.profiler) behind a config flag.

The reference has no built-in tracing (SURVEY.md §5: tqdm bars + ad-hoc
tlparse logs were its only timing signal); here any train run can capture an
XLA/TPU trace for a chosen step window with ``profile_dir`` +
``profile_start/profile_steps`` config fields. View with TensorBoard or
xprof (`tensorboard --logdir <dir>`).
"""
from __future__ import annotations

from typing import Optional

import jax


class StepProfiler:
    """Starts a jax.profiler trace at step ``start`` and stops it after
    ``num_steps`` steps. No-op when ``trace_dir`` is None."""

    def __init__(self, trace_dir: Optional[str], start: int = 10,
                 num_steps: int = 5):
        self.trace_dir = trace_dir
        self.start = start
        self.stop_after = start + num_steps
        self._active = False

    def step(self, it: int) -> None:
        if self.trace_dir is None:
            return
        if it == self.start and not self._active:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif it >= self.stop_after and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
