"""Streaming count-min sketch — the tip-mode twin of
operators/sketches.countmin_sketch, for live frequency surfaces where the
batch two-pass can't rescan history per micro-batch.

The counter matrix is additive (countmin_merge is an element-wise sum),
so streaming maintenance is exact, order-invariant, and duplication-free
under checkpointed exactly-once: state is one depth-row of `width` longs
per state key (the matrix row is the natural shard — every occurrence
contributes to all `depth` rows, so the upstream stateless projection
explodes the d (row, col) probes with the SAME md5 positions as the batch
operator, and each matrix row's full stream lands on its own state key).

Emissions are touched-cell snapshots (row, col, cnt); the latest emission
per cell IS the batch sketch of the stream's prefix (parity pinned across
a checkpoint restart and an adversarial re-ordering in tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

OUTPUT_SCHEMA = "row int, col int, cnt long"
STATE_SCHEMA = "cnts array<long>"


def countmin_stream(
    events: DataFrame, val_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Streaming (row, col, cnt) touched-cell snapshots of the running
    count-min matrix over `val_col`. Positions are md5_long(row || '|' ||
    value) % width — bit-identical to the batch operator, so batch
    estimates read from the latest streamed cells are the batch answers."""
    if width < 1 or depth < 1:
        raise ValueError(f"width and depth must be >= 1, got {width}x{depth}")

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        cnts = list(state.get[0]) if state.exists else [0] * width
        touched: set[int] = set()
        for pdf in pdfs:
            for c, n in pdf["col"].value_counts().items():
                cnts[int(c)] += int(n)
                touched.add(int(c))
        state.update((cnts,))
        yield pd.DataFrame(
            [{"row": key[0], "col": c, "cnt": cnts[c]} for c in sorted(touched)]
        )

    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    (md5_long(F.col(val_col).cast("string"), seed=r) % width)
                    .cast("int")
                    .alias("col"),
                )
                for r in range(depth)
            ]
        )
    ).alias("p")
    exploded = (
        events.filter(F.col(val_col).isNotNull())
        .select(probes)
        .select(F.col("p.row").alias("row"), F.col("p.col").alias("col"))
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return exploded.groupBy("row").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
