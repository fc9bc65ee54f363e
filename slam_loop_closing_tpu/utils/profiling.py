"""Profiling and tracing hooks (SURVEY.md §5: the reference has none — its
only <chrono> use timestamps the output filename, main.cpp:24,1674).

Provides ``jax.profiler`` trace capture around pipeline stages plus simple
wall-clock stage timers whose output feeds the frames/sec headline metric."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str | Path | None):
    """Capture a jax.profiler trace (TensorBoard format) around a block.
    No-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timing with a frames/sec summary."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0)

    def frames_per_sec(self, num_frames: int, stage: str | None = None):
        total = (self.stages.get(stage, 0.0) if stage
                 else sum(self.stages.values()))
        return num_frames / total if total > 0 else float("inf")

    def summary(self) -> str:
        lines = [f"  {k}: {v:.3f}s" for k, v in self.stages.items()]
        return "Stage timings:\n" + "\n".join(lines)


def annotate(name: str):
    """Named trace annotation for device timelines
    (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
