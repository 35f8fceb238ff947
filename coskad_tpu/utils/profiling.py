"""Tracing / profiling / numerics-debug harness.

The reference has no tracing at all (tqdm loops only; SURVEY.md section 5).
This module provides the TPU-native equivalents:

- `Timer` / `throughput`: block_until_ready-accurate wall timing of jitted
  steps, reporting windows/sec,
- `trace` context manager around jax.profiler for XProf-compatible device
  traces,
- `debug_nans` / `enable_nan_checks`: jax_debug_nans toggling for the
  race/NaN-detection role sanitizers play in native frameworks,
- `device_memory_stats`: live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@dataclass
class Timer:
    """Accumulating wall timer with device synchronization."""

    name: str = "step"
    times: List[float] = field(default_factory=list)

    @contextlib.contextmanager
    def measure(self, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - t0)

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {
            f"{self.name}/mean_s": sum(ts) / len(ts),
            f"{self.name}/p50_s": ts[len(ts) // 2],
            f"{self.name}/min_s": ts[0],
            f"{self.name}/max_s": ts[-1],
            f"{self.name}/count": float(len(ts)),
        }


def throughput(fn, *args, items_per_call: int, warmup: int = 1, iters: int = 10):
    """items/sec of a jitted callable, excluding compile (warmup calls)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return items_per_call * iters / dt


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XProf/Perfetto-compatible device trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans: any NaN produced by a jitted computation
    raises immediately with the offending primitive."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def enable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", True)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device live HBM statistics (bytes), where the backend reports them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = dict(d.memory_stats() or {})
        except Exception:
            stats[str(d)] = {}
    return stats
