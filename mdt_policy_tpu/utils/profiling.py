"""Profiling helpers — first-class tracing the reference lacks (SURVEY §5:
the reference ships only an unused `timeit` and a CUDA_LAUNCH_BLOCKING
leftover; here jax.profiler traces + step timing are part of the runtime)."""

from __future__ import annotations

import contextlib
import logging
import time
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax

logger = logging.getLogger(__name__)

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir, *, create_perfetto_link: bool = False) -> Iterator[None]:
    """jax.profiler trace context; view with TensorBoard / Perfetto."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir),
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profile written to %s", log_dir)


class StepTimer:
    """Rolling step-time statistics (p50/p90/max) with device sync points."""

    def __init__(self, window: int = 100):
        self.window = window
        self.samples = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        self.samples.append(dt)
        if len(self.samples) > self.window:
            self.samples.pop(0)
        return dt

    def stats(self) -> Dict[str, float]:
        import numpy as np
        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {"p50_ms": float(np.median(a) * 1e3),
                "p90_ms": float(np.percentile(a, 90) * 1e3),
                "max_ms": float(a.max() * 1e3),
                "mean_ms": float(a.mean() * 1e3)}
