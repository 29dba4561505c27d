"""Wall-clock timers + JAX profiler hooks.

Counterpart of the reference's duplicated ``Timer`` classes
(``/root/reference/eval_refinedet_voc.py:81-103``,
``eval_refinedet_coco.py:100-122``) plus the profiling upgrade SURVEY.md §5.1
calls for: ``jax.profiler`` trace context for real TPU timelines.
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """tic/toc accumulator (average_time, total_time, calls)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average: bool = True) -> float:
        self.diff = time.time() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is None.

    View with tensorboard or xprof: profile_trace('/tmp/jax-trace').
    """
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_annotation(name: str):
    """Named step annotation visible in profiler timelines."""
    import jax
    with jax.profiler.StepTraceAnnotation(name):
        yield
