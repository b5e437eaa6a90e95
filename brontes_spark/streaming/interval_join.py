"""Stream-stream interval (time-window) join — the streaming twin of
operators/range_join.interval_overlap_join, built on Spark's NATIVE
watermarked stream-stream inner join (JVM state store, no Python state):
the one Structured Streaming operator class (two buffered sides, state
expiry driven by the event-time range condition) the engine's other
streaming twins don't exercise.

Semantics: left events carry [l_ts, l_ts + l_dur), right events
[r_ts, r_ts + r_dur); a pair emits when the half-open intervals overlap
and the equi-keys match. The overlap predicate doubles as the state-expiry
bound: given watermarks, Spark derives how long each side's rows must be
buffered from the time-range condition (l_ts is within
[r_ts - l_dur, r_ts + r_dur)), so state is bounded by
watermark-lateness + interval span — the documented dial, exactly the
batch operator's bucket-width analog.

Batch parity is structural and test-pinned: draining both sides with
availableNow and comparing against interval_overlap_join over the same
rows (append mode; each pair emits once)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    l_ts: str,
    r_ts: str,
    l_dur: str,
    r_dur: str,
    on: list[str],
    lateness: str = "10 minutes",
) -> DataFrame:
    """Inner-join two streaming frames on `on` keys where
    [l_ts, l_ts + l_dur) overlaps [r_ts, r_ts + r_dur). `l_ts`/`r_ts` are
    event-time timestamp columns; `l_dur`/`r_dur` are interval-typed
    duration columns (e.g. built with expr("INTERVAL 1 HOUR")). Column
    names of the two sides must be disjoint apart from `on`."""
    overlap_l = set(left.columns) & set(right.columns) - set(on)
    if overlap_l:
        raise ValueError(
            f"ambiguous columns {sorted(overlap_l)}: alias one side first"
        )
    lw = left.withWatermark(l_ts, lateness)
    rw = right.withWatermark(r_ts, lateness)
    cond = F.lit(True)
    for k in on:
        cond = cond & (lw[k] == rw[k])
    # half-open overlap: l_ts < r_end AND r_ts < l_end — expressed on raw
    # event-time columns so Spark's range-condition analyzer can derive
    # both sides' state-expiry bounds from the watermarks
    cond = (
        cond
        & (lw[l_ts] < rw[r_ts] + rw[r_dur])
        & (rw[r_ts] < lw[l_ts] + lw[l_dur])
    )
    out_cols = [lw[k] for k in on]
    out_cols += [lw[c] for c in left.columns if c not in on]
    out_cols += [rw[c] for c in right.columns if c not in on]
    return lw.join(rw, cond, "inner").select(*out_cols)
