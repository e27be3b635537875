"""First-class timing/profiling — frames/s per chip is a north-star metric.

Replaces the reference's ad-hoc std::chrono prints (main.cpp:29-37,
map_builder.cc:306-342) and its dead ``Timer`` class (timer.cc) with a
structured span recorder plus optional jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import numpy as np

__all__ = ["SpanTimer", "trace_to"]


class SpanTimer:
    """Named span accumulator with percentile summaries and CSV/JSON dump
    (≙ Timer::writeTimeToFile, timer.cc:6-33, but actually wired in)."""

    def __init__(self):
        self.spans: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float):
        self.spans[name].append(seconds)

    def summary(self) -> dict:
        out = {}
        for name, vals in self.spans.items():
            v = np.asarray(vals)
            out[name] = {
                "n": int(len(v)),
                "mean_ms": float(v.mean() * 1e3),
                "median_ms": float(np.median(v) * 1e3),
                "p90_ms": float(np.percentile(v, 90) * 1e3),
                "total_s": float(v.sum()),
            }
        return out

    def report(self) -> str:
        rows = ["{:<14} {:>5} {:>9} {:>9} {:>9}".format(
            "span", "n", "median", "p90", "total")]
        for name, s in sorted(self.summary().items()):
            rows.append("{:<14} {:>5d} {:>7.1f}ms {:>7.1f}ms {:>8.2f}s".format(
                name, s["n"], s["median_ms"], s["p90_ms"], s["total_s"]))
        return "\n".join(rows)

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def trace_to(logdir: str | None):
    """Capture a jax.profiler trace (TensorBoard-viewable) around a block —
    the TPU counterpart of nvprof'ing the reference's TensorRT engines."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
