"""Hierarchical wall-clock profiler + optional device tracing.

TPU-native counterpart of the reference's ``ProfileLUA(true)`` /
``PrintStats()`` (2d_admm.lua:14, 746; ``-bActivateProfiler`` flag 2d:85):
phase timers accumulate into a tree keyed by the with-block nesting, and a
report table prints totals / counts / mean.  ``device_trace`` wraps
``jax.profiler`` for an xprof-compatible trace directory when deeper kernel
timing is needed.

Timers call ``block_until_ready`` on an optional sentinel so asynchronous
dispatch does not misattribute time.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Profiler:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._stack: list[str] = []

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """Time a phase; nests as parent/child keys.  sync: array (or pytree)
        to block_until_ready before stopping the clock."""
        if not self.enabled:
            yield
            return
        self._stack.append(name)
        key = "/".join(self._stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self.totals[key] += time.perf_counter() - t0
            self.counts[key] += 1
            self._stack.pop()

    def report(self) -> str:
        if not self.totals:
            return "(no phases recorded)"
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        w = max(len(k) for k, _ in rows)
        lines = [f"{'phase':<{w}}  {'total[s]':>10}  {'count':>7}  {'mean[ms]':>10}"]
        for k, t in rows:
            n = self.counts[k]
            lines.append(f"{k:<{w}}  {t:>10.3f}  {n:>7}  {t / n * 1e3:>10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (xprof-compatible)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


NULL = Profiler(enabled=False)
