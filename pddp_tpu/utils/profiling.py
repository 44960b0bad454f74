"""Lightweight profiling / observability helpers.

The reference's only observability is tqdm progress bars with live postfix
telemetry (ilqr.py:287-296, pddp.py:122-124, bnn/modules.py:181-195) plus
pytest-benchmark. Here that role is filled by:

 * the ``on_iteration`` / ``on_trial`` callback hooks on the controllers
   (kept from the reference), and
 * this module: wall-clock phase timers that block on device work, and a
   thin wrapper over ``jax.profiler`` for XLA-level traces viewable in
   TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["PhaseTimer", "trace", "block_and_time"]


def block_and_time(fn, *args, n=1, warmup=0, **kwargs):
    """Wall-clock of ``fn(*args, **kwargs)`` with device completion.

    Returns (seconds_per_call, last_output). Use warmup>=1 to exclude
    compilation from the measurement.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


class PhaseTimer:
    """Accumulating named phase timer.

    Usage::

        timer = PhaseTimer()
        with timer("forward"):
            derivs = forward(...)
        with timer("backward"):
            k, K, ok = backward(...)
        print(timer.summary())

    Each phase blocks on outstanding device work when it closes, so the
    numbers are end-to-end wall clock per phase.
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            # Flush the async dispatch queue so the phase owns its work.
            jax.effects_barrier()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self):
        """Formatted per-phase totals (ms) sorted by cost."""
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        return "\n".join(
            "{:<24s} {:>10.3f} ms  (x{})".format(
                name, total * 1e3, self.counts[name])
            for name, total in rows)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir="/tmp/pddp_tpu_trace"):
    """XLA-level profiler trace (open with TensorBoard or Perfetto).

    Usage::

        with profiling.trace("/tmp/trace"):
            result = solve(...)
            jax.block_until_ready(result)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
