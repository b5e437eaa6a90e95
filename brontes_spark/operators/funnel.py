"""Ordered-funnel analysis over event streams — generalized N-stage form.

One key shuffle total: events group per key into a sorted array, and an
in-row aggregate fold computes the first strictly-increasing occurrence
time of every stage. With strict `>` between consecutive stage times the
fold's answer provably equals the textbook N-way self-join formulation
(first stage-1 event; first stage-2 event strictly after it; ...): sorted
order makes the fold's first qualifying event exactly the join's MIN, and
ties at equal timestamps can never qualify either way. Property-pinned
against the brute force in tests/test_property.py; the 3-stage driver gate
(plans/timeseries.x9_funnel_stages) checks it against a 3-join SQL oracle.

Scale: replaces N full-stream self-join shuffles with ONE groupBy(key);
the fold is linear per key. The per-key event array must fit a row (the
usual collect_list bound) — at 100 TB pre-filter to the funnel's event
types first, which this operator does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    df: DataFrame,
    stages: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts_ns",
    type_col: str = "event_type",
    prefilter: bool = True,
) -> DataFrame:
    """(key, t1..tN nullable, stage int): tᵢ = first `stages[i-1]` event
    strictly after tᵢ₋₁; stage = deepest stage reached (0..N).

    prefilter=True (the 100 TB default) drops non-stage event types before
    the shuffle — keys with NO stage events then emit no row. Pass False
    to keep every key present (all-null times, stage 0) in one shuffle
    with no extra distinct/join — the driver gate's configuration. Either
    way only STAGE events enter the per-key array (prefilter=False wraps
    non-stage rows in a null struct that collect_list skips), so the
    collect_list row is bounded by the key's stage-event count, never its
    full event history."""
    n = len(stages)
    if n == 0:
        raise ValueError("at least one funnel stage required")
    e_struct = F.struct(
        F.col(ts_col).alias("ts"), F.col(type_col).alias("et")
    )
    if prefilter:
        src = df.filter(F.col(type_col).isin(list(stages)))
        e_col = e_struct
    else:
        src = df
        e_col = F.when(F.col(type_col).isin(list(stages)), e_struct)
    evs = src.select(F.col(key_col).alias("key"), e_col.alias("e"))
    init = F.struct(
        *[F.lit(None).cast("long").alias(f"t{i}") for i in range(1, n + 1)]
    )

    def step(acc, e):
        outs = []
        for i in range(1, n + 1):
            cond = acc[f"t{i}"].isNull() & (e["et"] == F.lit(stages[i - 1]))
            if i > 1:
                cond = cond & acc[f"t{i-1}"].isNotNull() & (e["ts"] > acc[f"t{i-1}"])
            outs.append(
                F.when(cond, e["ts"]).otherwise(acc[f"t{i}"]).alias(f"t{i}")
            )
        return F.struct(*outs)

    agg = evs.groupBy("key").agg(
        F.aggregate(F.array_sort(F.collect_list("e")), init, step).alias("r")
    )
    stage = F.lit(0)
    for i in range(1, n + 1):
        stage = F.when(F.col(f"r.t{i}").isNotNull(), i).otherwise(stage)
    return agg.select(
        F.col("key").alias(key_col),
        *[F.col(f"r.t{i}").alias(f"t{i}") for i in range(1, n + 1)],
        stage.cast("int").alias("stage"),
    )
