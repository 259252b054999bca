"""Tracing / profiling helpers (SURVEY.md §5 — the reference has none
beyond wall-clock; we provide jax.profiler traces + phase timers).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class phase_timer:
    """Accumulating wall-clock phase timer with hard device sync.

    Usage::
        t = phase_timer()
        with t.phase("forward"):
            out = step(...)
            t.sync(out)
        print(t.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    @staticmethod
    def sync(tree):
        """Force completion by pulling one scalar to host (reliable even
        through the axon relay where block_until_ready is not)."""
        leaves = jax.tree_util.tree_leaves(tree)
        if leaves:
            _ = float(leaves[0].reshape(-1)[0])

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(f"{name}: {total / n * 1000:.2f} ms/call ×{n}")
        return "\n".join(lines)
