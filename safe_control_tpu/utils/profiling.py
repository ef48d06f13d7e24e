"""Profiling and tracing hooks (SURVEY.md §5.1 — absent in the reference).

Thin, dependency-light wrappers over ``jax.profiler`` plus a wall-clock
timer that respects async dispatch.  Usage:

    with trace_to("/tmp/trace"):
        run_sweep(...)

    t = KernelTimer()
    with t.time("mpc_solve"):
        out = solve(...)           # block_until_ready'd automatically
    print(t.report())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class KernelTimer:
    """Wall-clock timing with device synchronization per region."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def time(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            out = holder.get("out", sync_value)
            if out is not None:
                jax.block_until_ready(out)
            self.samples[name].append(time.perf_counter() - t0)

    def report(self) -> str:
        lines = []
        for name, xs in sorted(self.samples.items()):
            n = len(xs)
            mean = sum(xs) / n
            lines.append(
                f"{name:30s} n={n:5d} mean={mean * 1e3:9.3f} ms "
                f"min={min(xs) * 1e3:9.3f} ms max={max(xs) * 1e3:9.3f} ms"
            )
        return "\n".join(lines)

    def mean(self, name: str) -> float:
        xs = self.samples[name]
        return sum(xs) / len(xs)
