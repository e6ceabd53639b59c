"""Profiling / tracing utilities.

Reference parity: mrpt CTimeLogger spans named align, align.1_prepare,
align.3.1_matchers ... (reference: ICP.cpp:46-342, enabled by
``icp-run --profiler``; stats dumped at destruction).

TPU-native equivalents:
- ``Profiler``: host-side wall-clock span accumulator with the same
  nested-name convention + a stats report (per-call mean/min/max).
- ``profile_scope``: wraps spans in ``jax.profiler.TraceAnnotation`` +
  ``jax.named_scope`` so device traces (``jax.profiler.trace``) carry the
  same names inside XLA timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class Profiler:
    """Host-side span accumulator (CTimeLogger analogue)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._spans: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def scope(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            with profile_scope(name):
                yield
        finally:
            self._spans[name].append(time.perf_counter() - t0)

    def stats(self) -> Dict[str, dict]:
        out = {}
        for name, ts in sorted(self._spans.items()):
            out[name] = {
                "calls": len(ts),
                "mean_ms": 1e3 * sum(ts) / len(ts),
                "min_ms": 1e3 * min(ts),
                "max_ms": 1e3 * max(ts),
                "total_s": sum(ts),
            }
        return out

    def report(self) -> str:
        lines = [
            f"{'span':40s} {'calls':>6s} {'mean[ms]':>10s} {'min[ms]':>10s} "
            f"{'max[ms]':>10s} {'total[s]':>9s}"
        ]
        for name, s in self.stats().items():
            lines.append(
                f"{name:40s} {s['calls']:6d} {s['mean_ms']:10.2f} "
                f"{s['min_ms']:10.2f} {s['max_ms']:10.2f} {s['total_s']:9.3f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def profile_scope(name: str):
    """Named scope visible in jax device profiles AND in jitted HLO
    metadata (jax.named_scope), usable around traced code."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        with jax.named_scope(name.replace(".", "_")):
            yield
