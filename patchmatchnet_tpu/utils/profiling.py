"""Profiling: jax.profiler trace capture + per-phase wall timers.

First-class replacement for the reference's ad-hoc per-batch time prints
(reference: train.py:93-106, eval.py:57-70; SURVEY §5.1): device traces
viewable in TensorBoard/XProf plus lightweight phase statistics.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def jax_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into `log_dir` (no-op when log_dir is falsy)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall time per named phase.

    Usage::

        timer = PhaseTimer()
        with timer("data"):
            batch = next(it)
        with timer("step"):
            state, metrics = train_step(state, batch, rng)
        print(timer.summary())
    """

    def __init__(self) -> None:
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.total[phase] += time.perf_counter() - start
            self.count[phase] += 1

    def mean(self, phase: str) -> float:
        return self.total[phase] / max(self.count[phase], 1)

    def summary(self) -> str:
        parts = [
            f"{phase}: {self.total[phase]:.2f}s total, "
            f"{self.mean(phase) * 1e3:.1f}ms avg over {self.count[phase]}"
            for phase in sorted(self.total)
        ]
        return "; ".join(parts)

    def as_dict(self) -> Dict[str, float]:
        return {f"time-{k}-mean-ms": self.mean(k) * 1e3 for k in self.total}
