"""Tracing / profiling helpers — first-class planner-rate metrics.

The reference's only instrumentation is the per-tick FPS print in
``skill_utils.time_tracking`` (:25-33) and the avg_sim/task/mot_freq columns
of its experiment logs (SURVEY.md §5 "Tracing / profiling").  Here:

  * :class:`RateTracker` — rolling planner-Hz / env-steps-per-second counters
    fed by the control loop (the TickLog already records raw per-tick times;
    this gives the live rolling view the reference printed).
  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace of the jitted planner step.
"""
from __future__ import annotations

import collections
import contextlib
import time
from typing import Optional

import jax


class RateTracker:
    """Rolling-window rates: planner Hz and env-steps/sec (K x T per replan)."""

    def __init__(self, window: int = 50, env_steps_per_replan: int = 0):
        self._times = collections.deque(maxlen=window)
        self.env_steps_per_replan = env_steps_per_replan
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def hz(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    @property
    def env_steps_per_sec(self) -> float:
        """Rollout throughput: replan rate x (K samples x T horizon steps)."""
        return self.hz * self.env_steps_per_replan

    def summary(self) -> dict:
        return {
            "planner_hz": round(self.hz, 2),
            "env_steps_per_sec": round(self.env_steps_per_sec, 1),
        }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/m3p2i_trace"):
    """``with trace(): loop.tick(i)`` -> TensorBoard trace of the device work."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
