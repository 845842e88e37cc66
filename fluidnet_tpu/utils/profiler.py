"""Timing utilities: step/pressure profiling + startup FPROP profiling.

Equivalents of the reference's profiling hooks (SURVEY.md §5.1):
  - conf.profile startup FPROP timing (fluid_net_train.lua:144-189),
  - tfluids.profilePressure wall-clock bracketing of the projection
    (simulate.lua:254-318) — on TPU the device sync is block_until_ready,
  - jax.profiler trace capture for deep dives (the tracing framework the
    reference never had).
"""

import contextlib
import time

import jax


class Timer:
    """Accumulating wall-clock timer with device synchronization."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def measure(self, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.total += time.perf_counter() - t0
        self.count += 1

    @property
    def mean(self):
        return self.total / max(self.count, 1)


def profile_fprop(fn, args, min_seconds=2.0, warmup=2):
    """Times a jitted callable: compile first, then run for >= min_seconds.
    Returns seconds/call (the reference profiles 10 s at startup and stores
    mconf.fpropTime, fluid_net_train.lua:144-189)."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < min_seconds:
        out = fn(*args)
        n += 1
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / max(n, 1)


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace wrapper (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
