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


def hbm_stats(device=None) -> Dict[str, int]:
    """Live/peak device-memory counters (bytes).  Returns {} where the
    backend exposes no memory_stats (some PJRT plugins / the CPU
    backend).  The reference has no memory observability at all; on GPU
    users fall back to nvidia-smi."""
    dev = device or jax.local_devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:          # noqa: BLE001 — plugin-dependent API
        return {}
    out = {}
    for key, name in (("bytes_in_use", "live_bytes"),
                      ("peak_bytes_in_use", "peak_bytes"),
                      ("bytes_limit", "limit_bytes")):
        if key in stats:
            out[name] = int(stats[key])
    return out
