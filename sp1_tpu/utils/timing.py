"""Per-stage timing spans (reference: sp1-gpu/crates/perf/src/report.rs
kHz split + tracing debug_span! around each pipeline stage).

Usage:
    from sp1_tpu.utils import timing
    with timing.span("commit"):
        ...
    timing.report()  # -> {"commit": 1.23, ...} (seconds, cumulative)

Spans nest; only top-level spans accumulate into the report (nested
spans accumulate under "parent/child"). Zero overhead unless enabled
via SP1_TPU_TIMING=1 or timing.enable().
"""

from __future__ import annotations

import contextlib
import os
import time

_ENABLED = os.environ.get("SP1_TPU_TIMING", "0") == "1"
_VERBOSE = os.environ.get("SP1_TPU_TIMING_VERBOSE", "0") == "1"
_TOTALS: dict[str, float] = {}
_STACK: list[str] = []


def enable(on: bool = True):
    global _ENABLED
    _ENABLED = on


def reset():
    _TOTALS.clear()


@contextlib.contextmanager
def span(name: str):
    if not _ENABLED:
        yield
        return
    key = "/".join(_STACK + [name])
    _STACK.append(name)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _STACK.pop()
        _TOTALS[key] = _TOTALS.get(key, 0.0) + dt
        if _VERBOSE:
            import sys

            print(f"[span] {key}: {dt:.2f}s", file=sys.stderr, flush=True)


def report() -> dict[str, float]:
    return {k: round(v, 4) for k, v in sorted(_TOTALS.items())}
