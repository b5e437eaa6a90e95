"""Streaming Markov transition log — the tip-mode twin of the batch
transition_stats (operators/markov.py).

The batch operator lags over the complete per-key history; the streaming
twin keeps ONE (last_state, last_ts, last_tie) triple per key in state and
emits each observed step (from_state -> to_state) exactly once, append
mode, as it happens. Aggregating the emitted step log by (from, to)
reproduces the batch transition counts — the parity test does exactly
that across a checkpoint restart.

State is three scalars per key ever seen (a fixed-bytes-per-key bound,
the streaming/dedup posture — no per-event history is ever stored).
NoTimeout: transitions never close; an idle key simply holds its last
state until the next event. In-batch events sort by (ts, tie) so
same-micro-batch reordering is invisible; ACROSS batches the twin is an
online operator with the funnel/sessionize one-sided contract — with
per-key nondecreasing arrival it equals the batch lag exactly (the
pinned case), while a late event that arrives after a newer one has
already advanced the state appends in ARRIVAL order (a live transition
log cannot retroactively splice history; every emitted step is still a
genuinely observed arrival-order step).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, from_state string, to_state string, ts_ns long"
)
STATE_SCHEMA = "last_state string, last_ts long, last_tie long"


def transition_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_ns",
    state_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """One appended row per observed per-key step; the first event of a
    key seeds state and emits nothing (not a transition — batch parity)."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_state, last_ts, last_tie = (
            state.get if state.exists else (None, -1, -1)
        )
        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, tie_col])
            for ts, tie, st in zip(
                pdf[ts_col].astype("int64"),
                pdf[tie_col].astype("int64"),
                pdf[state_col],
            ):
                if last_state is not None:
                    out.append(
                        {
                            "user_id": key[0],
                            "from_state": last_state,
                            "to_state": st,
                            "ts_ns": int(ts),
                        }
                    )
                last_state, last_ts, last_tie = st, int(ts), int(tie)
        state.update((last_state, last_ts, last_tie))
        yield pd.DataFrame(
            out, columns=["user_id", "from_state", "to_state", "ts_ns"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
