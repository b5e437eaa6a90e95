"""Streaming HyperLogLog — tip-mode twin of operators/sketches.hll_sketch.

There is deliberately almost no code here: HLL registers are a MAX
aggregate over a stateless codegen projection (bucket + rho per value),
and max is a native Spark streaming aggregate — so the batch operator's
plan IS the streaming plan, running entirely JVM-side with Spark's own
state store (the streaming/ohlc.py posture; no Python state, no
applyInPandasWithState). State is bounded by m = 2^p registers per key BY
CONSTRUCTION — no watermark needed, registers only grow monotonically and
never expire, which is exactly HLL's union semantics: out-of-order,
re-ordered, or replayed input cannot change the result (max is
commutative, associative, idempotent), so the register stream is
order-invariant and duplication-tolerant even BEYOND the checkpoint's
exactly-once guarantee.

Run in update output mode: each micro-batch emits the registers it
changed; the latest emission per (key, bucket) is the batch
hll_sketch of the stream's prefix (parity pinned across a checkpoint
restart in tests/test_streaming_hll.py). Feed the result to
operators/sketches.hll_distinct-style estimation on the reader side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sketches import hll_sketch


def hll_register_stream(
    events: DataFrame, key_col: str, val_col: str, p: int = 6
) -> DataFrame:
    """(key, bucket, rho_max) running registers over a streaming frame —
    literally the batch operator applied to the stream (see module note
    for why that is the whole implementation)."""
    return hll_sketch(events, key_col, val_col, p=p)
