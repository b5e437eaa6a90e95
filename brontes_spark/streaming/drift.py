"""Streaming corpus-drift monitoring — tip-mode twin of operators/drift.

Like streaming/hll.py, the interesting fact is how little code this
needs: token counts are a SUM aggregate over a stateless explode, and sum
is a native Spark streaming aggregate — so operators/drift.token_counts
applied to a streaming frame IS the streaming plan (pure JVM state store,
one state row per (key, token), update mode emits the counts each batch
changed). Addition is commutative/associative, so the running counts are
order-invariant and restart-safe under the checkpoint's exactly-once.

The TV score itself is a per-batch decision, not state: inside
foreachBatch, hand the CURRENT counts and the (static, broadcastable)
reference counts to operators/drift.tv_drift — the batch operator,
unchanged. tests/test_streaming_drift.py pins that the drained stream's
latest counts reproduce the batch TV exactly across a checkpoint restart,
i.e. live drift converges to batch drift as the stream catches up."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.drift import token_counts


def token_count_stream(
    events: DataFrame, text_col: str, key_cols: list[str] | None = None
) -> DataFrame:
    """(key_cols..., tok, cnt) running token counts over a streaming frame
    — literally the batch relation applied to the stream (see module
    note). Run in update output mode; the latest emission per (keys, tok)
    is the batch token_counts of the stream's prefix."""
    return token_counts(events, text_col, key_cols)
