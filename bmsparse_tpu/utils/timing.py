"""Phase timing — reproduces the reference's per-phase instrumentation
taxonomy (labels T_1..T_7, T_9, "Toda F", "bmSparse execution";
ref: src/bmSparse_SPGEMM.cu:835-853,951-957,1209-1220) with
std::chrono-equivalent wall clocks. Device work is synchronized at phase
boundaries via block_until_ready when a result is supplied.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax


def sync(x: Any = None):
    if x is not None:
        jax.block_until_ready(x)
    return x


class PhaseTimer:
    """Collects labeled phase durations in microseconds."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.phases: dict[str, float] = {}
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def phase(self, label: str, result: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            dt = (time.perf_counter() - t0) * 1e6
            self.phases[label] = self.phases.get(label, 0.0) + dt

    def total_us(self) -> float:
        return (time.perf_counter() - self._t0) * 1e6

    def report(self, stream=None) -> None:
        if not self.enabled:
            return
        emit = print if stream is None else (lambda s: stream.write(s + "\n"))
        for label, us in self.phases.items():
            emit(f"{label}: {us:.0f}")
        emit(f"Toda F: {self.total_us():.0f}")


def time_op(fn, *args, warmup: int = 1, iters: int = 10, **kw) -> tuple[float, Any]:
    """Median wall time (seconds) of fn(*args), fully synchronized."""
    out = None
    for _ in range(max(warmup, 1)):
        out = jax.block_until_ready(fn(*args, **kw))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out
