"""Profiling: structured traces + wall-clock accounting.

The reference's only profiling is ad-hoc ``@time`` / commented
``@benchmark`` probes (SURVEY.md §5 "Tracing / profiling"). Here:

- ``trace(...)``: context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace of the wrapped region (solver steps, epoch
  internals, collectives).
- ``Stopwatch``: cheap named wall-clock accumulator for per-phase timing
  (data-gen / compile / epoch / eval), dumped as JSON next to metrics.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/crnn_tpu_trace"):
    """Capture a profiler trace of the enclosed block."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside a trace (shows up in the timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Stopwatch:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }

    def dump(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
