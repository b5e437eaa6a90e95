"""Regular-grid gap filling with forward fill and linear interpolation —
the time-series densification primitive (TimescaleDB's time_bucket_gapfill
/ locf / interpolate family) for irregular event streams.

Semantics: per key, a grid of every `step`-aligned instant from
floor(min_ts/step)*step through max_ts. Each grid row reports
  * value_ffill — the last real observation at or before the grid instant
    (null before the first observation), and
  * value_interp — linear interpolation between the surrounding real
    observations (equals the observation when one lands exactly on the
    grid; falls back to ffill after the last observation; null before the
    first).

Scale shape: one groupBy(key) for per-key ranges, the grid generated
in-row (sequence + explode — never a join against a calendar table), one
union with the tagged real points, and ONE per-key ordered window that
computes both fills for all grid rows. Two shuffles total, both on the
key; grid size is (span/step) rows per key — `step` is the dial.

Float parity note: value arithmetic is IEEE double with a FIXED evaluation
shape — prev + (next - prev) * ((ts - prev_ts) / (next_ts - prev_ts)) —
so an oracle computing the same shape matches bit-for-bit (integer ts
differences are exact; one division, one multiply, one add).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step: int,
) -> DataFrame:
    """(key, grid_ts, value_ffill, value_interp) per `step`-aligned grid
    instant per key. Duplicate-timestamp observations are ordered by value
    (then ts) so the fill choice is total and engine-identical."""
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    key, ts, val = F.col(key_col), F.col(ts_col), F.col(val_col)
    ranges = df.groupBy(key.alias("key")).agg(
        F.min(ts).alias("mn"), F.max(ts).alias("mx")
    )
    grid = ranges.select(
        "key",
        F.explode(
            F.sequence(
                # FLOOR-aligned grid origin: mn - pmod(mn, step) floors for
                # negative timestamps too. (Correction to the r7 advice
                # note: DuckDB's integer `//` also truncates toward zero —
                # measured -7 // 2 = -3, it floors only for DOUBLEs — so
                # truncating `div` never actually diverged from the oracle;
                # the pmod form stays because FLOOR is the right grid
                # contract for pre-epoch ts, on BOTH sides.)
                F.expr(f"mn - pmod(mn, {step})"), F.col("mx"), F.lit(step).cast("long")
            )
        ).alias("ts"),
        F.lit(None).cast("double").alias("v"),
        F.lit(0).alias("is_real"),
    )
    real = df.select(
        key.alias("key"),
        ts.cast("long").alias("ts"),
        val.cast("double").alias("v"),
        F.lit(1).alias("is_real"),
    )
    # real points sort BEFORE the grid row at the same instant, so the
    # "at or before" frame already contains them; value tie-breaks pin the
    # duplicate-ts case to a total order
    w = W.partitionBy("key").orderBy(
        F.col("ts"), F.col("is_real").desc(), F.col("v")
    )
    real_v = F.when(F.col("is_real") == 1, F.col("v"))
    real_ts = F.when(F.col("is_real") == 1, F.col("ts"))
    prev_v = F.last(real_v, ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    prev_ts = F.last(real_ts, ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    next_v = F.first(real_v, ignorenulls=True).over(
        w.rowsBetween(0, W.unboundedFollowing)
    )
    next_ts = F.first(real_ts, ignorenulls=True).over(
        w.rowsBetween(0, W.unboundedFollowing)
    )
    interp = (
        F.when(prev_v.isNull(), F.lit(None).cast("double"))
        .when(next_v.isNull() | (next_ts == prev_ts), prev_v)
        .otherwise(
            prev_v
            + (next_v - prev_v)
            * ((F.col("ts") - prev_ts) / (next_ts - prev_ts))
        )
    )
    return (
        grid.unionByName(real)
        .select(
            "key",
            "ts",
            "is_real",
            prev_v.alias("value_ffill"),
            interp.alias("value_interp"),
        )
        .filter(F.col("is_real") == 0)
        .select("key", F.col("ts").alias("grid_ts"), "value_ffill", "value_interp")
    )
