"""Lightweight stage tracing / timing.

The reference's observability is `tracing` log lines at each pipeline
stage (SURVEY.md §5). Here every stage is additionally wall-clock timed
and aggregated, and a JAX profiler trace can be captured around any block
for in-depth TPU analysis (xprof), which the reference has no analog of.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Iterator

logger = logging.getLogger("qwen3_asr_rs_tpu.trace")


class Timings:
    """Accumulates per-stage wall times."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    def add(self, stage: str, seconds: float):
        self.totals[stage] += seconds
        self.counts[stage] += 1

    def summary(self) -> str:
        lines = []
        for stage in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{stage}: {self.totals[stage]*1000:.1f} ms"
                f" ({self.counts[stage]}x)"
            )
        return "; ".join(lines)


GLOBAL_TIMINGS = Timings()


def dump_metrics(path: str | None = None) -> dict:
    """Export accumulated stage metrics as a dict (and JSON file if asked).

    The reference has no metrics export (SURVEY.md §5); this serializes
    per-stage totals/counts for scraping. The CLI honors ``ASR_METRICS=<path>``.
    """
    import json

    data = {
        stage: {
            "total_ms": round(GLOBAL_TIMINGS.totals[stage] * 1000, 3),
            "count": GLOBAL_TIMINGS.counts[stage],
        }
        for stage in GLOBAL_TIMINGS.totals
    }
    if path:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=2)
        logger.info("metrics written to %s", path)
    return data


@contextlib.contextmanager
def stage_timer(stage: str, timings: Timings | None = None) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        (timings or GLOBAL_TIMINGS).add(stage, dt)
        logger.debug("%s took %.1f ms", stage, dt * 1000)


@contextlib.contextmanager
def jax_profile(logdir: str) -> Iterator[None]:
    """Capture a TPU profiler trace viewable with xprof/tensorboard."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
