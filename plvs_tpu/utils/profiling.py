"""Stage timing: tick/tock stopwatch + per-stage statistics report.

TPU-native equivalent of the reference's profiling trio (reference:
include/Stopwatch.h TICK/TOCK macro profiler :52-121, REGISTER_TIMES
per-stage vectors include/Tracking.h:236-250 dumped by PrintTimeStats
src/Tracking.cc:391, optional Tracy/Rerun hooks). Device work is async
under jax, so scopes optionally block on a pytree of arrays to charge the
wait to the right stage.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class Stopwatch:
    """Accumulates wall-time samples per named stage."""

    def __init__(self):
        self.samples: dict[str, list[float]] = defaultdict(list)
        self._open: dict[str, float] = {}

    def tick(self, name: str):
        self._open[name] = time.perf_counter()

    def tock(self, name: str, block_on=None):
        if block_on is not None:
            import jax

            jax.block_until_ready(block_on)
        t0 = self._open.pop(name, None)
        if t0 is not None:
            self.samples[name].append(time.perf_counter() - t0)

    @contextlib.contextmanager
    def scope(self, name: str, block_on=None):
        self.tick(name)
        try:
            yield
        finally:
            self.tock(name, block_on)

    def stats(self) -> dict[str, dict]:
        out = {}
        for k, v in self.samples.items():
            a = np.asarray(v)
            out[k] = {
                "mean_ms": float(a.mean() * 1e3),
                "std_ms": float(a.std() * 1e3),
                "median_ms": float(np.median(a) * 1e3),
                "count": len(a),
            }
        return out

    def report(self) -> str:
        """Formatted per-stage table (reference: Tracking::PrintTimeStats)."""
        lines = [f"{'stage':<28}{'mean ms':>10}{'median':>10}{'std':>10}{'n':>7}"]
        for k, s in sorted(self.stats().items()):
            lines.append(
                f"{k:<28}{s['mean_ms']:>10.2f}{s['median_ms']:>10.2f}"
                f"{s['std_ms']:>10.2f}{s['count']:>7}"
            )
        return "\n".join(lines)

    def reset(self):
        self.samples.clear()
        self._open.clear()


GLOBAL = Stopwatch()
