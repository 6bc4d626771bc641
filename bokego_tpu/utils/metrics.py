"""Tracing, profiling, and throughput metrics.

The reference's only perf instrumentation is ad-hoc wall-clock timing
(gtp.py:368-372) and tqdm bars (SURVEY.md §5 "Tracing/profiling: none").
Here throughput counters are first-class — they are the benchmark metrics
(BASELINE.json) — plus hooks into ``jax.profiler`` for device traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict


@dataclasses.dataclass
class Counter:
    total: float = 0.0
    count: int = 0

    def add(self, dt: float, n: int = 1):
        self.total += dt
        self.count += n

    @property
    def rate(self) -> float:
        """events / second."""
        return self.count / self.total if self.total > 0 else 0.0

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


class Metrics:
    """Named phase timers and throughput counters.

    Usage::

        m = Metrics()
        with m.phase("rollout", n=batch):
            trees = step(...)
        print(m.report())
    """

    def __init__(self):
        self.phases: dict[str, Counter] = defaultdict(Counter)
        self.counters: dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str, n: int = 1, block_on=None):
        """Time a phase; ``n`` = units of work (e.g. rollouts, games).

        Pass ``block_on`` (a jax array/pytree) to include device time —
        otherwise async dispatch makes timings meaningless.
        """
        t0 = time.monotonic()
        yield
        if block_on is not None:
            import jax

            jax.block_until_ready(block_on)
        self.phases[name].add(time.monotonic() - t0, n)

    def count(self, name: str, n: float = 1):
        self.counters[name] += n

    def rollouts_per_sec(self, phase: str = "rollout") -> float:
        return self.phases[phase].rate

    def games_per_min(self, phase: str = "game") -> float:
        return self.phases[phase].rate * 60.0

    def report(self) -> str:
        lines = []
        for name, c in sorted(self.phases.items()):
            lines.append(
                f"{name}: {c.count} in {c.total:.2f}s "
                f"({c.rate:.1f}/s, {c.mean * 1000:.2f} ms each)"
            )
        for name, v in sorted(self.counters.items()):
            lines.append(f"{name}: {v:g}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a ``jax.profiler`` device trace (view with TensorBoard or
    Perfetto).  Replaces the reference's nothing."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (``jax.profiler.TraceAnnotation``)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
