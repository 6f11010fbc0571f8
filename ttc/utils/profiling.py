"""Tracing and profiling utilities.

The reference's observability is ad-hoc time.time() prints and an unused
timing decorator (reference: src/tof/tof_downloading.py:23-36,
src/download_and_predict_job.py:146,1086,2069). Here:

- StageTimer: structured per-stage wall-clock accounting with device
  sync (host readback) so TPU-async stages are charged correctly
- timed: decorator variant
- trace_to: context manager around jax.profiler for XLA-level traces
"""
from __future__ import annotations

import contextlib
import functools
import logging
import time
from collections import defaultdict

import numpy as np

log = logging.getLogger("ttc")


def _sync(value):
    """Force completion of device work reachable from value."""
    try:
        import jax

        leaves = jax.tree_util.tree_leaves(value)
        for leaf in leaves:
            if hasattr(leaf, "addressable_data") or hasattr(leaf, "device"):
                np.asarray(leaf)
    except Exception:
        pass
    return value


class StageTimer:
    def __init__(self, name: str = "pipeline"):
        self.name = name
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, stage_name: str, sync_result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_result is not None:
                _sync(sync_result)
            dt = time.perf_counter() - t0
            self.totals[stage_name] += dt
            self.counts[stage_name] += 1

    def record(self, stage_name: str, seconds: float):
        self.totals[stage_name] += seconds
        self.counts[stage_name] += 1

    def report(self) -> str:
        lines = [f"[{self.name}] stage timings:"]
        for stage_name, total in sorted(self.totals.items(),
                                        key=lambda kv: -kv[1]):
            n = self.counts[stage_name]
            lines.append(f"  {stage_name:30s} {total:8.2f}s "
                         f"({n}x, {total / n:6.3f}s avg)")
        return "\n".join(lines)

    def log_report(self):
        stages = {name: round(total, 3)
                  for name, total in self.totals.items()}
        log.info(self.report(), extra={"ttc": {
            "timer": self.name, "stages_s": stages,
            "counts": dict(self.counts)}})


def timed(fn):
    """Decorator printing wall time per call (device-synced result)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _sync(out)
        log.info("%s: %.2fs", fn.__name__, time.perf_counter() - t0)
        return out

    return wrapper


@contextlib.contextmanager
def trace_to(log_dir: str):
    """XLA profiler trace (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
