"""Staging area for gate specs built mid-round when the 50-slot driver
window has no headroom.

The driver verifies the FIRST 50 ordered registry entries per round, and a
brand-new gate (no driver history) sorts risk-first — so registering a new
gate can eject a stale re-attestation from the window and break the
rotation contract. When that would happen, stage the spec here with the
SAME (builder, oracle, survey_ref) shape as registry entries: it is
verified by the SAME sf0.01 DuckDB-parity harness
(tests/test_pending_parity.py) and runnable through the CLI, and the next
round promotes it (the r10→r11 move: git-mv this file to plans/waveN.py
and swap ``@pending`` for ``@register``).

Round-11 status: the 12-gate tier staged here during round 10 was
promoted at r11 start (plans/wave11.py); the r11 driver window seats
exactly those 12 (staleness -1) plus the 38 stalest data-backed
re-attestations — scripts/simulate_r11.py derives the seating from the
real on-disk CORRECTNESS history and
tests/test_plans.py::test_r11_window_seating pins it hermetically. The
specs below are the r12 tier: the round-11 operator additions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import EV_CTE, QuerySpec

PENDING: dict[str, QuerySpec] = {}


def pending(name: str, oracle: str | None, survey_ref: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        PENDING[name] = QuerySpec(name=name, build=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco
