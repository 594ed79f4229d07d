"""Profiling + tracing: jax.profiler capture and per-step timing.

The reference has NO profiling at all (SURVEY.md §5); this is a new
first-class subsystem: TensorBoard-compatible trace capture around training
steps plus a lightweight streaming step timer whose stats feed the metric
sink (train/step_time_ms, train/images_per_sec).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    logger.info("profiler: tracing to %s", log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler: trace saved to %s", log_dir)


class StepTimer:
    """Streaming per-step wall-time stats. ``block_on`` should be a device
    array from the step output so timing includes device execution."""

    def __init__(self, warmup: int = 2) -> None:
        self.warmup = warmup
        self._times: List[float] = []
        self._count = 0
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def stop(self, block_on=None) -> float:
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - (self._last or time.perf_counter())
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return dt

    def stats(self, batch_size: Optional[int] = None) -> Dict[str, float]:
        if not self._times:
            return {}
        import numpy as np

        arr = np.asarray(self._times)
        out = {
            "step_time_ms_mean": float(arr.mean() * 1e3),
            "step_time_ms_p50": float(np.percentile(arr, 50) * 1e3),
            "step_time_ms_p95": float(np.percentile(arr, 95) * 1e3),
        }
        if batch_size:
            out["images_per_sec"] = batch_size / float(arr.mean())
        return out


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage where the backend exposes it."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[f"{d.id}_bytes_in_use"] = s.get("bytes_in_use", 0)
            out[f"{d.id}_bytes_limit"] = s.get("bytes_limit", 0)
        except Exception:
            continue
    return out
