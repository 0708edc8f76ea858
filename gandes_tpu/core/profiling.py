"""Tracing / profiling utilities.

The reference's only observability is ad-hoc ``time.time()`` deltas
(SURVEY.md section 5 "Tracing / profiling"); this module provides the
TPU-native equivalents: a lightweight phase timer with per-phase
throughput stats, and a ``jax.profiler`` trace context for real device
profiles (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class StepTimer:
    """Accumulates wall-time per named phase; ``summary()`` reports mean /
    p50 / p95 and fraction of total per phase."""

    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        total = sum(sum(v) for v in self.samples.values()) or 1e-12
        out = {}
        for name, vals in self.samples.items():
            arr = np.asarray(vals)
            out[name] = {
                "count": len(arr),
                "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p95_s": float(np.percentile(arr, 95)),
                "total_s": float(arr.sum()),
                "frac": float(arr.sum() / total),
            }
        return out

    def report(self) -> str:
        rows = ["phase                    count   mean(ms)   p95(ms)   total(s)   frac"]
        for name, s in sorted(self.summary().items(), key=lambda kv: -kv[1]["total_s"]):
            rows.append(
                f"{name:<24} {s['count']:>5} {s['mean_s'] * 1e3:>10.2f} "
                f"{s['p95_s'] * 1e3:>9.2f} {s['total_s']:>10.2f} {s['frac']:>6.1%}"
            )
        return "\n".join(rows)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context — device timelines, HLO, memory."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
