"""Tracing / profiling helpers (SURVEY.md §5 "Tracing": the reference has
only a wall-clock FPS script; here: jax.profiler traces + phase timers)."""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock per-phase timing with steps/s accounting.

    Usage:
        timer = PhaseTimer()
        with timer.phase("rollout", steps=envs * T): ...
        print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.steps: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, steps: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.steps[name] = self.steps.get(name, 0) + steps

    def report(self) -> str:
        rows = {}
        for name, total in self.totals.items():
            row = {"seconds": round(total, 3)}
            if self.steps.get(name):
                row["steps_per_s"] = round(self.steps[name] / total, 1)
            rows[name] = row
        return json.dumps(rows)
