"""Staging area for gate specs built mid-round when the 50-slot driver
window has no headroom.

The driver verifies the FIRST 50 ordered registry entries per round, and a
brand-new gate (no driver history) sorts risk-first — so registering a new
gate can eject a stale re-attestation from the window and break the
rotation contract. When that would happen, stage the spec here with the
SAME (builder, oracle, survey_ref) shape as registry entries: it is
verified by the SAME sf0.01 DuckDB-parity harness
(tests/test_pending_parity.py) and runnable through the CLI, and the next
round promotes it with a one-line move to ``@register``.

Round-8 status: EMPTY. All 21 round-7 staged gates were promoted at r8
start per the r7 playbook — corpus/sketch/text gates to plans/corpus.py,
x11/x12/x15/s11 to plans/timeseries.py, o7 to plans/relational.py — and
seat in the r8 driver window together with the 29 stalest r6
re-attestations (the 21 remaining r6 gates ride to r9 under local parity
cover; COVERAGE.md names them).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .registry import QuerySpec

PENDING: dict[str, QuerySpec] = {}


def pending(name: str, oracle: str | None, survey_ref: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        PENDING[name] = QuerySpec(name=name, build=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco
