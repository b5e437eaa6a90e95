"""Streaming KMV distinct-cardinality sketch — the tip-mode twin of
operators/sketches.kmv_distinct, for live per-key cardinality surfaces
(distinct users per contract, distinct tokens per pool) where re-scanning
history per micro-batch is off the table.

State per key is the sketch itself: the k smallest distinct 60-bit md5
values seen so far — at most k longs, independent of stream length or
value universe. Each micro-batch hashes its values with the EXACT bit
pattern of the batch side's md5_long (first 15 md5 hex chars as a
non-negative long), set-unions them into the state, re-ranks, and emits
the key's current (n_seen, kth_min, est_distinct) snapshot — identical to
what batch kmv_distinct reports over the stream's prefix, because KMV
union is commutative/idempotent: ANY arrival order, duplication, or
batching of the same rows folds to the same k minima (parity and
out-of-order invariance are test-pinned across a checkpoint restart).

Estimator and small-cardinality fallback mirror the batch operator:
n_seen < k -> exact count, else (k-1)*M // h_(k) in exact Python ints.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_seen long, kth_min long, est_distinct long"
STATE_SCHEMA = "hvs array<long>"

#: 60-bit md5 hash space, matching operators/sketches._M
_M = 1 << 60


def _md5_long(v: str) -> int:
    """Bit-exact Python mirror of functions.hashing.md5_long(col)."""
    return int(hashlib.md5(v.encode("utf-8")).hexdigest()[:15], 16)


def kmv_distinct_stream(
    events: DataFrame, key_col: str, val_col: str, k: int = 64
) -> DataFrame:
    """Streaming (key, n_seen, kth_min, est_distinct) snapshots, one row
    per touched key per micro-batch; downstream keeps the latest row per
    key. Values are hashed from their string form — cast upstream types
    deterministically, as the batch operator does."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        minima: set[int] = set(int(h) for h in state.get[0]) if state.exists else set()
        for pdf in pdfs:
            for v in pdf["v"]:
                minima.add(_md5_long(str(v)))
                # bound the working set: only the k smallest ever matter
                if len(minima) > 4 * k:
                    minima = set(sorted(minima)[:k])
        sk = sorted(minima)[:k]
        state.update((sk,))
        n = len(sk)
        if n < k:
            est = n
        else:
            est = (k - 1) * _M // sk[-1] if sk[-1] else None
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "n_seen": n,
                    "kth_min": sk[-1] if n == k else None,
                    "est_distinct": est,
                }
            ]
        )

    prepared = events.filter(F.col(val_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("key"),
        F.col(val_col).cast("string").alias("v"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
