"""Profiling / tracing hooks.

The reference's only instrumentation is wall-clock stage deltas printed at
the end of each run (upstream main.py:2144-2151). This framework keeps the
per-stage timing as a structured dict on every PageResult and adds device
tracing: `trace(logdir)` wraps a region in a jax.profiler trace (viewable
in TensorBoard / Perfetto), and `annotate(name)` scopes host-side regions
with TraceAnnotation so they show up on the profiler timeline.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Iterable, Iterator


@contextlib.contextmanager
def trace(logdir: str | None) -> Iterator[None]:
    """Device+host profiler trace into `logdir` (no-op when None)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side scope annotation on the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def merge_stage_timings(timings: Iterable[Dict[str, float]]
                        ) -> Dict[str, Dict[str, float]]:
    """Aggregate per-page stage timings into {stage: {sum, mean, max}}."""
    acc: Dict[str, list] = {}
    for t in timings:
        for k, v in t.items():
            acc.setdefault(k, []).append(v)
    return {k: {"sum": float(sum(v)),
                "mean": float(sum(v) / len(v)),
                "max": float(max(v))}
            for k, v in acc.items()}
