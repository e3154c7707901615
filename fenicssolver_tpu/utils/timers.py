"""Phase timers + optional jax profiler traces.

Replaces the reference's dolfin ``Timer`` usage (SURVEY.md §5.1:
``SolverBase.py:514-540``, Picard/FSI loop timers) with named phase timers
and an opt-in ``jax.profiler`` trace: set ``FST_PROFILE_DIR=/tmp/trace`` to
capture a TensorBoard-compatible device trace of the solve.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager


class PhaseTimers:
    """Accumulates wall-clock per named phase (assembly, solve, ...)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self, logger=None):
        lines = [
            f"{name}: {tot:.3f}s over {self.counts[name]} calls"
            for name, tot in sorted(self.totals.items())
        ]
        msg = "phase timings: " + "; ".join(lines) if lines else "no phases timed"
        if logger:
            logger.info(msg)
        return msg


@contextmanager
def maybe_profile():
    """jax.profiler trace when FST_PROFILE_DIR is set."""
    trace_dir = os.environ.get("FST_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
