"""Streaming gap-based sessionization — the tip-mode twin of the batch
x8_sessionize plan (plans/timeseries.py), with REAL event-time session
closing: a session emits exactly once, when it closes, either because a
later event for the same user arrives past the inactivity gap (same-batch
or later-batch) or because the stream's WATERMARK passes the session's
gap horizon with no new events (GroupStateTimeout.EventTimeTimeout — the
idle-user case a NoTimeout fold can never close).

applyInPandasWithState keyed by user: state is (session_seq, start_ns,
last_ns, n_events) — four longs per user SEEN (a timed-out session
collapses to a closed marker rather than state.remove, because the session
counter must survive idle periods for batch-parity numbering; a returning
user's next session is seq+1, not a restart at 1). Closed sessions hold no
event data, so the store is 32 bytes per user ever seen — the same
fixed-bytes-per-key bound as streaming/dedup. At 100 TB a TTL eviction
dial could trade numbering continuity for store size; documented, not
defaulted. Session arithmetic
stays on exact ns longs in state; the watermark column is the event time
truncated to microseconds (Spark timestamps are us-precision) and is used
ONLY to schedule timeouts — a sub-ms rounding can shift WHEN an idle
session closes by <1 ms of watermark, never its emitted values.

Parity contract (test-pinned): with per-user nondecreasing event-time
arrival, the closed-session stream equals the batch x8 sessionization of
the same events, with each user's final still-open session emitting once
the watermark passes its horizon. Out-of-order events inside one
micro-batch are handled by the in-batch sort; an event older than the
open session's last_ns extends that session (duration math uses min/max,
so values stay correct), while an event older than an ALREADY-CLOSED
session follows the same online contract as the funnel twin: closed
sessions are immutable, the event joins the current session — a live
sessionizer can merge or split differently than a batch replay, but
per-session aggregates it DOES emit are exact over the events it assigned.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, session_start_ns long, "
    "session_end_ns long, duration_ns long"
)
STATE_SCHEMA = "session_seq long, start_ns long, last_ns long, n long"


def sessionize_stream(
    events: DataFrame,
    gap_ns: int = 30 * 60 * 1_000_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts_ns",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming (user_id, session_seq, n_events, session_start_ns,
    session_end_ns, duration_ns), one row per CLOSED session (append-only;
    no snapshot rows to dedup downstream). `watermark_delay` is the usual
    lateness allowance: events later than it are dropped by the engine
    before the fold, the standard Structured Streaming contract."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(seq: int, start: int, last: int, n: int) -> dict:
            return {
                "user_id": key[0],
                "session_seq": seq,
                "n_events": n,
                "session_start_ns": start,
                "session_end_ns": last,
                "duration_ns": last - start,
            }

        if state.hasTimedOut:
            seq, start, last, n = state.get
            # keep a CLOSED marker (n=0) instead of state.remove(): the
            # session counter must survive idle periods, else a returning
            # user restarts at seq 1 and breaks batch-parity numbering.
            # No new timeout is scheduled, so the marker never refires.
            state.update((seq, 0, 0, 0))
            yield pd.DataFrame([emit(seq, start, last, n)])
            return
        if state.exists:
            seq, start, last, n = state.get
            if n == 0:  # closed marker: no open session
                start = last = None
        else:
            seq, start, last, n = 0, None, None, 0
        out: list[dict] = []
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "eid"]
        )
        for r in rows.itertuples(index=False):
            t = int(r.ts)
            if start is None:
                seq, start, last, n = seq + 1, t, t, 1
            elif t - last > gap_ns:
                out.append(emit(seq, start, last, n))
                seq, start, last, n = seq + 1, t, t, 1
            else:
                start, last, n = min(start, t), max(last, t), n + 1
        state.update((seq, start, last, n))
        # close when the watermark passes the open session's gap horizon
        state.setTimeoutTimestamp(last // 1_000_000 + gap_ns // 1_000_000 + 1)
        yield pd.DataFrame(out)

    filtered = (
        events.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col("event_id").alias("eid"),
            F.timestamp_micros(
                (F.col(ts_col) / 1000).cast("long")
            ).alias("event_time"),
        )
        .withWatermark("event_time", watermark_delay)
    )
    return filtered.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
