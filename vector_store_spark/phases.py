"""Opt-in phase attribution for composite (build + CRUD + serve) queries.

The streaming queries grew this first (queries_streaming.PHASE_LOG): a
composite bench row mixes one-time build cost with per-query serving cost,
so a regression in the total does not name its phase. Arming ``PHASE_LOG``
(bench extras only — the hot path stays untimed when it is None) makes the
instrumented queries record each phase's wall seconds; the bench then runs
the query a second time against the memoized artifact to isolate the pure
serve cost.
"""

from __future__ import annotations

import time

#: None (default) = no timing. Bench extras set this to {} around a single
#: cold run, then read the per-phase seconds back.
PHASE_LOG: dict | None = None


def mark(name: str, t0: float) -> float:
    """Record ``now - t0`` under ``name`` when armed; returns the new phase
    start either way (accumulates if the phase fires more than once)."""
    now = time.perf_counter()
    if PHASE_LOG is not None:
        PHASE_LOG[name] = round(PHASE_LOG.get(name, 0.0) + (now - t0), 4)
    return now
