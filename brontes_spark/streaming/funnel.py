"""Streaming ordered-funnel tracking — the tip-mode twin of the batch
operators/funnel.funnel_stage_times, for live conversion dashboards: events
arrive in micro-batches and each key's deepest-stage-reached must stay
current without replaying history.

`applyInPandasWithState` keyed by the funnel key: state is the N nullable
stage timestamps (the SAME fold accumulator as the batch operator, 8 bytes
per stage per key), each micro-batch folds its events in (ts, type) order,
and one snapshot (key, t1..tN, stage) row emits per key per batch
(append emission, the same snapshot-stream contract as streaming/state.py
— downstream keeps the deepest row per key, which is monotone). Because
the fold uses STRICT > between consecutive stages, same-timestamp tie order
cannot change the answer (see the batch module's proof sketch), so any
arrival that is nondecreasing in ts across batches reproduces the batch
operator exactly — pinned by tests/test_streaming_dedup.py's funnel test
across a checkpoint restart. Out-of-order late events follow the usual
online contract: an event older than an already-satisfied stage cannot
retroactively improve it (first-qualifying-wins), and a dependent-stage
event that arrives before its prerequisite is consumed without effect.
The guarantee is ONE-SIDED and test-pinned
(test_streaming_funnel_out_of_order_understates_never_overstates): for
ANY arrival order, streaming depth <= the batch replay's depth and every
satisfied streaming t_i >= the batch t_i — a live dashboard can
undercount conversions until reprocessing, never overcount. (Proof
sketch: by induction, any event advancing the stream state has
ts > t_{i-1}^stream >= t_{i-1}^batch, so it also qualifies in the batch
fold at an equal-or-earlier position.) This is the dashboard-correct
behavior when reprocessing is off the table.

State size: N longs per key — bounded by the key universe, not stream
length; RocksDB state store at scale, fold unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def funnel_stream(
    events: DataFrame,
    stages: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts_ns",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming (key, t1..tN, stage) — one updated row per key per
    micro-batch that touched it. Events of non-stage types are filtered
    before the shuffle (the batch operator's prefilter=True shape)."""
    n = len(stages)
    if n == 0:
        raise ValueError("at least one funnel stage required")
    key_type = dict(events.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, "
        + ", ".join(f"t{i} long" for i in range(1, n + 1))
        + ", stage int"
    )
    state_schema = ", ".join(f"t{i} long" for i in range(1, n + 1))
    stage_list = list(stages)

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ts = list(state.get) if state.exists else [None] * n
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "et"]
        )
        for r in rows.itertuples(index=False):
            for i, sname in enumerate(stage_list):
                if ts[i] is not None or r.et != sname:
                    continue
                if i == 0 or (ts[i - 1] is not None and r.ts > ts[i - 1]):
                    ts[i] = int(r.ts)
                break  # one event advances at most one stage
        state.update(tuple(ts))
        stage = sum(1 for t in ts if t is not None)
        yield pd.DataFrame(
            [
                {
                    key_col: key[0],
                    **{f"t{i+1}": ts[i] for i in range(n)},
                    "stage": stage,
                }
            ]
        )

    # null ts or null key cannot participate in a funnel (and pandas would
    # promote a NaN-bearing ts column to float64, corrupting ns precision
    # for every OTHER event in the batch) — drop them before the shuffle,
    # the per-record quarantine the batch operator gets from its nulls-
    # sort-out window semantics
    filtered = (
        events.filter(F.col(type_col).isin(stage_list))
        .filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias(key_col),
            F.col(ts_col).alias("ts"),
            F.col(type_col).alias("et"),
        )
    )
    return filtered.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
