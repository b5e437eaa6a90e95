"""Streaming as-of enrichment — the tip-mode twin of the batch backward
as-of join (operators/asof.py, X1): enrich a query/event stream with the
most recent reference observation per key, online.

The batch join sorts the union of both sides; a stream cannot sort the
future, but BACKWARD as-of needs only the latest reference row seen so
far — so state is ONE (ref_ts, ref_tie, ref_payload) triple per key
(fixed bytes per key, the streaming/dedup posture; compare the
stream-static join Spark offers, which re-reads a STATIC right side —
this twin's right side is itself a live stream). Both sides arrive in one
stream tagged by `is_ref`; each micro-batch sorts by (ts, is_ref DESC,
tie) so a same-instant reference is visible to a same-instant query —
exactly the batch operator's "right rows at the exact left timestamp ARE
visible" tie rule — and among equal-time references the greatest tiebreak
wins, also matching batch.

Out-of-order contract (one-sided, the funnel/sessionize/markov family):
with per-key nondecreasing arrival the emitted enrichment equals the
batch as-of join row-for-row (the pinned case). A reference arriving
LATE — after a younger reference already advanced the state — is applied
only from its arrival point forward when it is newer than the held state,
and DISCARDED when older (state keeps (ts, tie) precisely to decide
this); queries already emitted are immutable. An online enricher can
therefore under-inform but never time-travel.

NoTimeout: the latest reference never expires; add an upstream TTL filter
when staleness must void matches (the batch `tolerance` dial) — the
emitted gap_ns column carries what a downstream filter needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key long, query_id long, ts_ns long, ref_ts long, ref_val double, "
    "gap_ns long"
)
STATE_SCHEMA = "ref_ts long, ref_tie long, ref_val double"


def asof_enrich_stream(
    tagged: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts_ns",
    tie_col: str = "event_id",
    is_ref_col: str = "is_ref",
    val_col: str = "value",
) -> DataFrame:
    """One appended row per QUERY event: (key, query_id, ts_ns, ref_ts,
    ref_val, gap_ns), ref_* NULL when no reference has been seen yet for
    the key (the batch how='left' face). Reference events update state
    and emit nothing."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ref_ts, ref_tie, ref_val = (
            state.get if state.exists else (None, None, None)
        )
        out: list[dict] = []
        for pdf in pdfs:
            # same-instant refs first (is_ref DESC), greatest tie last so
            # the final same-ts ref wins state — the batch tie rule
            pdf = pdf.sort_values(
                [ts_col, is_ref_col, tie_col], ascending=[True, False, True]
            )
            for ts, tie, is_ref, val in zip(
                pdf[ts_col].astype("int64"),
                pdf[tie_col].astype("int64"),
                pdf[is_ref_col],
                pdf[val_col],
            ):
                if is_ref:
                    newer = ref_ts is None or (int(ts), int(tie)) >= (
                        ref_ts,
                        ref_tie if ref_tie is not None else -1,
                    )
                    if newer:
                        ref_ts, ref_tie, ref_val = int(ts), int(tie), float(val)
                    # an OLDER late reference is discarded: state must
                    # only ever move forward in (ts, tie)
                else:
                    out.append(
                        {
                            "key": key[0],
                            "query_id": int(tie),
                            "ts_ns": int(ts),
                            "ref_ts": ref_ts,
                            "ref_val": ref_val,
                            "gap_ns": None
                            if ref_ts is None
                            else int(ts) - ref_ts,
                        }
                    )
        if ref_ts is not None:
            state.update((ref_ts, ref_tie, ref_val))
        yield pd.DataFrame(
            out,
            columns=["key", "query_id", "ts_ns", "ref_ts", "ref_val", "gap_ns"],
        )

    return tagged.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
