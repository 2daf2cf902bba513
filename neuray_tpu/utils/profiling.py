"""Profiling / tracing hooks (the reference has none — SURVEY.md §5
calls for jax.profiler traces + per-stage wall timing in the rebuild).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler trace (open in TensorBoard / xprof). No-op when
    logdir is None."""
    if logdir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock timer for named pipeline stages.

    Note: on-device work is async; wrap stages so that each ends with a
    blocking readback (or call .sync with a jax array) for honest times.
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                import jax
                jax.block_until_ready(sync_value)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def report(self) -> str:
        lines = [f"{k}: total {self.totals[k]:.3f}s over "
                 f"{self.counts[k]} calls "
                 f"({self.totals[k] / max(self.counts[k], 1) * 1e3:.1f} "
                 f"ms/call)" for k in sorted(self.totals)]
        return "\n".join(lines)
