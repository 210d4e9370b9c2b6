"""Profiling helpers.

Capability match for the reference's tracing hooks: env_time/pth_time splits
(av_nav/ppo/ppo_trainer.py:326-336) and habitat's profiling_wrapper range
contexts (habitat/utils/profiling_wrapper.py:62). TPU-native additions:
`jax.profiler` trace capture around training windows for TensorBoard's
profile plugin.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class Timings:
    """Accumulating named wall-clock splits (env_time / pth_time style)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def time(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0

    def summary(self) -> str:
        return " ".join(f"{k}={v:.2f}s" for k, v in sorted(self.totals.items()))

    def reset(self) -> None:
        self.totals.clear()


@contextlib.contextmanager
def range_context(name: str) -> Iterator[None]:
    """profiling_wrapper.RangeContext equivalent → jax named scope + TraceAnnotation."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax profiler trace viewable in TensorBoard."""
    if not log_dir:
        yield
        return
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
