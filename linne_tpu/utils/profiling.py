"""Profiling helpers — the framework's tracing/observability layer.

The reference has no in-process tracing (SURVEY.md §5); performance is
measured by timing whole CLI invocations. Here the equivalent is:

- `trace(logdir)`: a context manager wrapping `jax.profiler` so a batch
  encode/decode can be captured and inspected in TensorBoard/XProf
  (device kernels, transfers, host gaps);
- `stage_timer()`: lightweight wall-clock stage accounting for the host
  side (packing, entropy coding), since the tunnel's async dispatch makes
  naive timers lie (see tests/conftest notes: block_until_ready may be a
  no-op; force with a host pull).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per named stage; print with report()."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{name:24s} {self.totals[name]*1000:9.2f}ms "
                         f"(x{self.counts[name]})")
        return "\n".join(lines)
