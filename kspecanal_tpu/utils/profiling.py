"""Tracing / profiling utilities (SURVEY.md §5 tracing).

The reference only prints per-iteration wall-clock deltas
(``ZeroSpan:{i}:{dt}``, kspecanal.py:459-463,516-522,718-724).  Here:

  * :class:`StageTimer` keeps those per-iteration deltas AND derived
    samples/s rates per pipeline stage;
  * :func:`trace` wraps a block in a ``jax.profiler`` trace whose output
    can be opened in TensorBoard / Perfetto (set ``KSPEC_TRACE_DIR`` or
    pass ``tpuProfile <dir>`` on the CLI).
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

from kspecanal_tpu.utils.logging import log_info


class StageTimer:
    """Per-stage wall-clock + throughput accounting."""

    def __init__(self):
        self.times: Dict[str, List[float]] = defaultdict(list)
        self.samples: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, samples: int = 0) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name].append(time.perf_counter() - t0)
            self.samples[name] += samples

    def rate(self, name: str) -> float:
        """Samples/s over everything recorded for a stage."""
        total = sum(self.times[name])
        return self.samples[name] / total if total else 0.0

    def report(self) -> str:
        lines = []
        for name, ts in self.times.items():
            total = sum(ts)
            line = (f"{name}: n={len(ts)} total={total:.3f}s "
                    f"mean={total / len(ts) * 1e3:.2f}ms")
            if self.samples[name]:
                line += f" rate={self.rate(name) / 1e6:.2f} Msamp/s"
            lines.append(line)
        return "\n".join(lines)

    def log_report(self):
        for line in self.report().splitlines():
            log_info(f"profile: {line}")


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace context; no-op when no directory is configured."""
    trace_dir = trace_dir or os.environ.get("KSPEC_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
    log_info(f"profiler trace written to {trace_dir}")
