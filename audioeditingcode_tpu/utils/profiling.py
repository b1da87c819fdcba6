"""Profiling / tracing instrumentation.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars only); this
is greenfield TPU tooling: ``jax.profiler`` trace capture around any phase
plus a lightweight steps/sec phase timer the CLIs print.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) when
    a directory is given; no-op otherwise."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[profile] trace written to {profile_dir}")


class PhaseTimer:
    """Wall-clock phase timing with steps/sec reporting.

    Usage::

        timer = PhaseTimer()
        with timer.phase("inversion", steps=200):
            ... run ...
        timer.report()
    """

    def __init__(self):
        self.phases: Dict[str, Dict[str, float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str, steps: Optional[int] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = {"seconds": dt}
            if steps:
                self.phases[name]["steps"] = steps
                self.phases[name]["steps_per_sec"] = steps / dt

    def report(self) -> None:
        for name, d in self.phases.items():
            extra = (f", {d['steps_per_sec']:.1f} steps/s"
                     if "steps_per_sec" in d else "")
            print(f"[timing] {name}: {d['seconds']:.3f}s{extra}")

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return dict(self.phases)
