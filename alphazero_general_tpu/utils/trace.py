"""Structured phase tracing (SURVEY.md §5 "tracing/profiling").

The reference's tracing story is timing meters printed to console/GUI
(reference: Coach.py:327-355, NNetWrapper.py:127-183, Arena.pyx:261-311)
plus Cython ``profile=True`` directives for cProfile. The TPU-native
equivalent here:

* every Coach phase (self-play, train, arena) is wrapped in
  :func:`PhaseTracer.phase`, which records wall seconds as a
  ``time/<phase>`` scalar through the metrics writer (JSONL + TB) — the
  always-on tier;
* setting ``args.profile_dir`` additionally captures a **device trace**
  (``jax.profiler.trace``) for each phase into
  ``<profile_dir>/<phase>-iterNNN``, viewable in TensorBoard's profile
  plugin / XProf — the deep tier used for the kernel-level numbers in
  ROADMAP.md (per-op device time, fusion layout copies, MXU utilization).
"""

from __future__ import annotations

import contextlib
import time


class PhaseTracer:
    """Wall-clock phase timer with optional jax.profiler device traces.

    ``writer``: a MetricsWriter/NullWriter (``add_scalar(tag, val, step)``).
    ``profile_dir``: when truthy, each phase also captures a device trace
    (first ``max_traces`` occurrences per phase name, to bound disk).
    """

    def __init__(self, writer, profile_dir: str = "",
                 max_traces: int = 3):
        self.writer = writer
        self.profile_dir = profile_dir or ""
        self.max_traces = int(max_traces)
        self._counts: dict = {}

    @contextlib.contextmanager
    def phase(self, name: str, step: int = 0):
        t0 = time.perf_counter()  # monotonic: NTP steps cannot skew durations
        ctx = contextlib.nullcontext()
        if self.profile_dir:
            seen = self._counts.get(name, 0)
            if seen < self.max_traces:
                self._counts[name] = seen + 1
                import os

                import jax

                ctx = jax.profiler.trace(
                    os.path.join(self.profile_dir, f"{name}-iter{step:03d}"))
        try:
            with ctx:
                yield
        finally:
            self.writer.add_scalar(f"time/{name}",
                                   time.perf_counter() - t0, step)
