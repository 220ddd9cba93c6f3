"""Profiling and throughput instrumentation.

The reference only prints wall-clock per-epoch times (train_for_clean.py:245)
and CUDA memory telemetry (train_for_clean.py:19-31). TPU-native equivalents:
- ``trace(logdir)``: jax.profiler trace context for xprof/tensorboard.
- ``StepTimer``: steady-state step time + clips/sec with compile-step
  exclusion (the first step includes XLA compilation).
- ``device_memory_stats``: per-device HBM usage where the backend reports it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)
        return False

    @property
    def steady_times(self) -> List[float]:
        return self._times[self.skip_first:]

    def mean_step_time(self) -> float:
        ts = self.steady_times
        return sum(ts) / len(ts) if ts else float("nan")

    def clips_per_sec(self, clips_per_step: int) -> float:
        t = self.mean_step_time()
        return clips_per_step / t if t > 0 else float("nan")

    def summary(self, clips_per_step: Optional[int] = None) -> Dict:
        out = {
            "steps": len(self._times),
            "mean_step_s": self.mean_step_time(),
            "first_step_s": self._times[0] if self._times else None,
        }
        if clips_per_step:
            out["clips_per_sec"] = self.clips_per_sec(clips_per_step)
        return out


def device_memory_stats() -> Dict[str, Dict]:
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
