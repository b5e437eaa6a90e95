"""Streaming Benford monitoring — the online governance twin.

Like streaming/drift.py, the point is how little code a correct online
monitor needs when the batch operator was designed count-first: digit
counting is a commutative/associative aggregate, so
operators/benford.digit_counts applied to a streaming frame IS the
streaming plan — pure JVM state (one state row per digit, nine total),
update mode, order-invariant and restart-safe under the checkpoint's
exactly-once. No Python state, no watermark (a forensic screen wants
all-time counts; window it upstream for a sliding variant).

The chi-square report is a per-batch decision, not state: inside
foreachBatch, hand the current nine-row counts to
operators/benford.benford_report — the batch scorer, unchanged.
tests/test_streaming_benford.py pins that the drained stream's latest
counts reproduce the batch screen digit-for-digit across a checkpoint
restart."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.benford import digit_counts


def digit_count_stream(events: DataFrame, cents_col: str) -> DataFrame:
    """(digit, n_obs) running leading-digit counts over a streaming frame
    — literally the batch relation applied to the stream (module note).
    Run in update output mode; the latest emission per digit is the
    batch digit_counts of the stream's prefix."""
    return digit_counts(events, cents_col)
