"""Phase timing & profiling.

The reference logs wall-clock phase timings with ``time.time()`` +
``get_elapsed_time`` (ssrs/utils.py:97-108; call sites
ssrs/simulator.py:205-215,274-284,359-382). This module provides the same
human-readable format plus optional ``jax.profiler`` trace integration and a
structured in-memory phase log.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


def elapsed_str(start: float) -> str:
    """Human format matching the reference (ssrs/utils.py:97-108)."""
    hours, rem = divmod(time.time() - start, 3600)
    mins, secs = divmod(rem, 60)
    if hours == 0:
        if mins == 0:
            return f'{int(secs) + 1} sec'
        return f'{int(mins)} min {int(secs)} sec'
    return f'{int(hours)} hr {int(mins)} min'


class PhaseTimer:
    """Structured phase timer; optionally emits jax.profiler traces."""

    def __init__(self, trace_dir: Optional[str] = None):
        self.records: List[Dict] = []
        self.trace_dir = trace_dir

    @contextlib.contextmanager
    def phase(self, name: str, **meta):
        ctx = (jax.profiler.TraceAnnotation(name)
               if self.trace_dir is not None else contextlib.nullcontext())
        start = time.perf_counter()
        with ctx:
            yield
        dur = time.perf_counter() - start
        self.records.append({'phase': name, 'seconds': dur, **meta})

    def summary(self) -> str:
        lines = [f'{r["phase"]}: {r["seconds"]:.3f} s' for r in self.records]
        return '\n'.join(lines)
