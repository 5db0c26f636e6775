"""Run metrics, timing, and profiling.

The reference has no timers or counters beyond stderr ``debug()`` traces
compiled out in release builds (dbg.h:50-57) and a debug-only walk-table
branch count (needleman-wunsch.c:624-625).  This module is the
observability layer the SURVEY (§5) calls for:

* :class:`RunReport` — structured per-run metrics: fill/walk wall time,
  cell-update throughput (GCUPS), pairs/s, solution and branch counts;
  renders in the reference's human-readable stderr style.
* :func:`timed` — context manager accumulating wall-time per phase.
* :func:`trace` — optional ``jax.profiler`` trace wrapper, enabled with
  ``NW_TPU_TRACE_DIR`` (produces a Perfetto/TensorBoard trace).
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from typing import Dict, Optional


@dataclasses.dataclass
class RunReport:
    pairs: int = 0
    cells: int = 0
    fill_seconds: float = 0.0
    walk_seconds: float = 0.0
    solution_count: Optional[int] = None
    branch_count: Optional[int] = None
    score_min: Optional[int] = None
    score_max: Optional[int] = None
    phases: Dict[str, float] = dataclasses.field(default_factory=dict)

    @property
    def gcups(self) -> float:
        return self.cells / self.fill_seconds / 1e9 if self.fill_seconds else 0.0

    @property
    def pairs_per_second(self) -> float:
        total = self.fill_seconds + self.walk_seconds
        return self.pairs / total if total else 0.0

    def summary(self) -> str:
        """Human-readable run summary (extends the reference's stderr
        summary format, computation.c:271-281)."""
        lines = []
        if self.solution_count is not None:
            n = self.solution_count
            lines.append(f"{n} optimal alignment{'s' if n > 1 else ''}")
        lines.append(
            f"{self.pairs} pair{'s' if self.pairs != 1 else ''}, "
            f"{self.cells} cells"
        )
        lines.append(
            f"fill {self.fill_seconds * 1e3:.2f} ms ({self.gcups:.2f} GCUPS), "
            f"walk {self.walk_seconds * 1e3:.2f} ms, "
            f"{self.pairs_per_second:.1f} pairs/s"
        )
        if self.branch_count is not None:
            lines.append(f"{self.branch_count} branches in walk table")
        if self.score_min is not None:
            lines.append(f"score range [{self.score_min}, {self.score_max}]")
        for name, secs in self.phases.items():
            lines.append(f"phase {name}: {secs * 1e3:.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def timed(report: RunReport, phase: str):
    """Accumulate wall time into ``report.phases[phase]`` (also mapped
    onto fill/walk when the phase is named so)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        report.phases[phase] = report.phases.get(phase, 0.0) + dt
        if phase == "fill":
            report.fill_seconds += dt
        elif phase == "walk":
            report.walk_seconds += dt


@contextlib.contextmanager
def trace(name: str = "nw_tpu"):
    """jax.profiler trace scope, enabled by NW_TPU_TRACE_DIR."""
    trace_dir = os.environ.get("NW_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
