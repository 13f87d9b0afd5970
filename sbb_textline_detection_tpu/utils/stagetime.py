"""Device-time and FLOPs accounting for pipeline stages.

The reference's only instrumentation is wall-clock stage prints (upstream
main.py:2144-2151). Wall clock alone can't say whether a stage is limited
by the chip or by the single host core, so every device dispatch in this
framework runs inside `device_section(flops=...)`: the wrapper accumulates
dispatch+transfer wall time and executed-program FLOPs into a thread-local
ledger that the detector snapshots per stage. bench.py turns the totals
into `device_seconds` / `host_seconds` / `mfu` fields.

"Device seconds" here is host-observed dispatch wall time (includes the
tunnel/transfer overhead of this serving environment) — an upper bound on
chip busy time. FLOPs come from XLA's own cost model
(`compiled.cost_analysis()['flops']`), recorded once per compiled program.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager

_TLS = threading.local()


def reset() -> None:
    """Zero this thread's ledger (start of a stage or page)."""
    _TLS.device_seconds = 0.0
    _TLS.flops = 0.0


def snapshot() -> tuple:
    """(device_seconds, flops) accumulated on this thread since reset()."""
    return (getattr(_TLS, "device_seconds", 0.0),
            getattr(_TLS, "flops", 0.0))


def add(seconds: float, flops: float = 0.0) -> None:
    _TLS.device_seconds = getattr(_TLS, "device_seconds", 0.0) + seconds
    _TLS.flops = getattr(_TLS, "flops", 0.0) + flops


@contextmanager
def device_section(flops: float = 0.0):
    """Wrap one device dispatch (+result transfer): accumulates its wall
    time and the executed program's FLOPs into the thread ledger."""
    t0 = time.time()
    try:
        yield
    finally:
        add(time.time() - t0, flops)


def flops_of(compiled) -> float:
    """Executed-program FLOPs from an AOT-compiled jax stage (0.0 if the
    backend reports no cost model)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0) or 0.0)
    except Exception:
        return 0.0
