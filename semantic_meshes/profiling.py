"""Tracing / profiling utilities.

The reference has no tracing (SURVEY.md §5: wall-clock anecdotes and tqdm
only). Here:
- `annotate(name)`: context manager emitting a jax.profiler
  TraceAnnotation (shows up in TensorBoard/perfetto traces) plus a
  wall-clock accumulator,
- `PhaseTimers`: per-phase accumulated timings with a report() string,
- `trace_to(dir)`: whole-program device trace via jax.profiler.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimers:
    """Accumulate wall-clock per named phase (host-side; pair with
    jax.block_until_ready at phase ends for device-accurate numbers)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self.totals[name] += time.perf_counter() - t0
                self.counts[name] += 1

    def report(self):
        lines = ["phase timings:"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"  {name}: {self.totals[name]:.3f}s "
                f"({self.counts[name]} calls, "
                f"{self.totals[name] / max(self.counts[name], 1) * 1e3:.1f} "
                "ms/call)"
            )
        return "\n".join(lines)


_global_timers = PhaseTimers()


def annotate(name):
    """Module-level phase annotation using the global timer registry."""
    return _global_timers.phase(name)


def report():
    return _global_timers.report()


@contextlib.contextmanager
def trace_to(log_dir):
    """Capture a device trace viewable in TensorBoard / perfetto."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
