"""Profiling and step timing.

The reference has no profiler hooks — only wall-clock prints and tqdm bars
(SURVEY.md §5 "Tracing"). Here:

- `trace(logdir)`: context manager around `jax.profiler` traces, viewable
  in TensorBoard / Perfetto;
- `StepTimer`: lightweight per-step wall-clock stats (mean/p50/p95,
  samples/sec) with a warmup skip for compile steps;
- `annotate`: named trace spans (`jax.profiler.TraceAnnotation`).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step statistics with compile-warmup skip."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._seen = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return False

    def stats(self, items_per_step: Optional[int] = None) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        out = {
            "steps": float(n),
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            # nearest-rank p95: ceil(0.95n)-th value, 0-based index
            # ceil(0.95n)-1 (int(0.95n) overshoots by one rank, reporting
            # the max at n=20)
            "p95_s": ts[max(0, -(-19 * n // 20) - 1)],
        }
        if items_per_step:
            out["items_per_sec"] = items_per_step / out["mean_s"]
        return out
