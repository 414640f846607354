"""Tracing / profiling utilities.

The reference's observability is progress prints and wall-clock comments
(SURVEY.md §5.1). Here it is first-class: scoped wall-clock timers with a
collected report, and a jax.profiler trace context for device-level
inspection (feeds the <60 s end-to-end target).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional, Tuple


class Timings:
    """Hierarchical wall-clock section timer."""

    def __init__(self):
        self.records: List[Tuple[str, float]] = []
        self._stack: List[str] = []

    @contextlib.contextmanager
    def section(self, name: str):
        self._stack.append(name)
        label = "/".join(self._stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records.append((label, time.perf_counter() - t0))
            self._stack.pop()

    def report(self) -> str:
        lines = []
        for label, dt in self.records:
            depth = label.count("/")
            lines.append(f"{'  ' * depth}{label.split('/')[-1]:<40s} {dt:8.2f}s")
        return "\n".join(lines)

    def totals(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for label, dt in self.records:
            out[label] = out.get(label, 0.0) + dt
        return out


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace scope (viewable in TensorBoard/XProf). No-op
    when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, **kwargs):
    """Run fn, block on its outputs, return (result, seconds)."""
    import jax

    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
