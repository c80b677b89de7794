"""Per-pass timing + profiling helpers.

Counterpart of the reference's cudaEvent printf instrumentation
(``/root/reference/src/pathtrace.cu:352-374`` etc.): wall-clock timings via
``block_until_ready`` plus optional ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PassTimer:
    """Collects per-pass wall-clock ms; print with :meth:`table`."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.times = defaultdict(list)

    @contextlib.contextmanager
    def time(self, name: str, result=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        self.times[name].append((time.perf_counter() - t0) * 1e3)

    def record(self, name: str, ms: float) -> None:
        self.times[name].append(ms)

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its outputs, record elapsed ms."""
        if not self.enabled:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.times[name].append((time.perf_counter() - t0) * 1e3)
        return out

    def table(self, last_n: int = 16) -> str:
        rows = []
        for name, samples in self.times.items():
            recent = samples[-last_n:]
            rows.append(
                f"  {name:<24s} {sum(recent) / len(recent):8.3f} ms"
                f"  (last {samples[-1]:8.3f} ms, n={len(samples)})"
            )
        return "\n".join(rows)

    def mean_ms(self, name: str, last_n: int = 16) -> float:
        s = self.times.get(name, [])
        if not s:
            return float("nan")
        recent = s[-last_n:]
        return sum(recent) / len(recent)


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Wrap a region in a jax.profiler trace when log_dir is given."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
