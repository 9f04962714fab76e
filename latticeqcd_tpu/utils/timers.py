"""Per-phase timers + optional XLA profiler hooks.

The reference only has wall-clock @timed prints (SURVEY.md section 5
"Tracing / profiling": "Build should add: per-phase timers + optional
XLA profiler hooks"). PhaseTimers accumulates named phase durations;
`xla_trace` context wraps a region in jax.profiler.trace so the
TensorBoard-readable trace lands in the given directory.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict


@dataclass
class PhaseTimers:
    totals: Dict[str, float] = field(default_factory=lambda: defaultdict(float))
    counts: Dict[str, int] = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["# phase timings"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"#   {name:20s} {tot:10.3f} s  ({n} calls, {tot/max(n,1):.4f} s/call)")
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(trace_dir=None):
    """Optional XLA/TensorBoard profiler region (no-op without a dir)."""
    if trace_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(str(trace_dir)):
        yield
