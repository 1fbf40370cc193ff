"""Tracing / profiling / numerics-debug subsystem.

The reference's observability is hand-rolled (LogProgress rate logging,
wall-clock timers, permanent autograd anomaly detection —
/root/reference/src/utils.py:66-130, src/solver.py:433). TPU-native
equivalents (SURVEY.md §5.1/5.2):

- ``trace(logdir)``           — jax.profiler trace capture (TensorBoard/
                                 xprof format) around any code region
- ``StepTimer``               — per-step wall/device timing with EMA
- ``enable_nan_debugging()``  — jax debug_nans/debug_infs (the analog of
                                 torch.autograd.set_detect_anomaly, but
                                 opt-in: the reference left it always on,
                                 a permanent slowdown — SURVEY §2.5.3)
- ``checkify_step(fn)``       — optional jax.experimental.checkify wrap
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str = "profile", create_perfetto_link: bool = False):
    """Capture a device trace: ``with trace('profile/'): step(...)``."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {logdir}")


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per-step timing with warmup skip and EMA."""

    def __init__(self, warmup: int = 2, ema: float = 0.9):
        self.warmup = warmup
        self.ema = ema
        self.count = 0
        self.avg = None
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.avg = dt if self.avg is None else \
                self.ema * self.avg + (1 - self.ema) * dt
        return False

    @property
    def steps_per_sec(self):
        return 1.0 / self.avg if self.avg else 0.0


def enable_nan_debugging(nans: bool = True, infs: bool = False) -> None:
    """Fail fast on NaN/Inf anywhere in jitted code."""
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)


def checkify_step(fn):
    """Wrap a step function with checkify error accumulation: returns
    (err, out); call ``err.throw()`` host-side to surface failures."""
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)
