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
        self.durations = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                self.totals[name] += dt
                self.counts[name] += 1
                self.durations[name].append(dt)

    def record(self, name, seconds):
        """Record an already-measured duration (e.g. process start /
        import time stamped before the timers object could exist)."""
        self.totals[name] += float(seconds)
        self.counts[name] += 1
        self.durations[name].append(float(seconds))

    def median(self, name):
        """Median call duration in seconds (0.0 if the phase never ran).

        The mean is the wrong steady-state number on a tunneled device:
        the first call of a phase carries the XLA compile (30-130 s
        through the tunneled compile service), which at typical call
        counts dominates the average; the median is compile-free."""
        d = sorted(self.durations[name])
        if not d:
            return 0.0
        n = len(d)
        mid = n // 2
        return d[mid] if n % 2 else 0.5 * (d[mid - 1] + d[mid])

    def as_dict(self):
        """Machine-readable snapshot: {phase: {total_s, calls, median_s}}
        (bench drivers parse this to separate one-time costs — device
        acquisition, compiles — from steady-state per-call rates)."""
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "calls": self.counts[name],
                "median_s": round(self.median(name), 4),
            }
            for name in self.totals
        }

    def report(self):
        lines = ["phase timings:"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"  {name}: {self.totals[name]:.3f}s "
                f"({self.counts[name]} calls, "
                f"{self.totals[name] / max(self.counts[name], 1) * 1e3:.1f} "
                "ms/call, "
                f"{self.median(name) * 1e3:.1f} ms median)"
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
