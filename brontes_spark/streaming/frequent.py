"""Streaming heavy-hitter candidates — the tip-mode twin of the batch
operators/sketches.frequent_items, for live "what's trending" surfaces
(hot tokens / domains / contracts) where the batch two-pass can't run per
micro-batch.

Sharded Misra-Gries in state: values hash-shard under `shards` state keys
(md5-derived, engine-deterministic), so every occurrence of a value lands
in exactly ONE shard and that shard's MG summary sees the value's full
stream. State per shard is two bounded arrays (values as strings, counter
lower bounds) of at most `counters` entries; each micro-batch folds the
shard's new exact value counts in with the standard
add-then-subtract-(k+1)th-largest compaction and emits the shard's current
candidate snapshot (downstream keeps the latest rows per shard — the same
snapshot-stream contract as streaming/funnel.py).

Guarantees (the online halves of the batch operator's proof):
* COMPLETENESS: an item with global frequency > shard_rows/(counters+1)
  — i.e. heavy within its shard, which a globally-heavy item always is —
  is present in its shard's snapshot. Pinned against the batch reference
  in tests.
* ONE-SIDED counts: emitted `lb_count` is the MG lower bound — never
  above the true count, undercounting by at most shard_rows/(counters+1).
  Exact counts come from the batch operator's verification pass when the
  candidate set is acted on (the usual sketch-then-verify split).

State size: shards x counters x (value width + 8 bytes) — a dial, not a
function of stream length or value universe.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "shard int, value string, lb_count long"
STATE_SCHEMA = "vals array<string>, cnts array<long>"


def frequent_items_stream(
    events: DataFrame,
    val_col: str,
    counters: int = 64,
    shards: int = 32,
) -> DataFrame:
    """Streaming (shard, value, lb_count) candidate snapshots, one batch of
    rows per touched shard per micro-batch. Values ride as strings (the
    state schema is fixed; cast upstream types to string deterministically
    in both engines)."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, cnts = state.get
            counts = dict(zip(list(vals), (int(c) for c in cnts)))
        else:
            counts = {}
        for pdf in pdfs:
            for v, c in pdf["v"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > counters:
                sub = sorted(counts.values(), reverse=True)[counters]
                counts = {v: c - sub for v, c in counts.items() if c > sub}
        state.update((list(counts.keys()), list(counts.values())))
        yield pd.DataFrame(
            [
                {"shard": key[0], "value": v, "lb_count": c}
                for v, c in sorted(counts.items())
            ]
        )

    hashed = (
        events.filter(F.col(val_col).isNotNull())
        .select(F.col(val_col).cast("string").alias("v"))
        .withColumn(
            "shard",
            (F.conv(F.substring(F.md5(F.col("v")), 1, 15), 16, 10)
             .cast("long") % shards).cast("int"),
        )
    )
    return hashed.groupBy("shard").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
