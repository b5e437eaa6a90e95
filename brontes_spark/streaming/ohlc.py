"""Streaming OHLC candles — tip-mode twin of operators/windows.
ohlc_downsample, as a PURE built-in watermarked window aggregation (no
Python state at all: min_by/max_by/count are native streaming aggregates,
so the whole operator runs JVM-side with Spark's own state store).

Candles only close when the watermark passes the bucket end (append
mode), which is exactly the semantics a live candle feed wants: a row is
emitted once, when its candle is final up to the allowed lateness.
Batch parity is structural — the aggregate expressions are the SAME
composite-key min_by/max_by the batch operator uses, pinned by a test
that drains a stream with availableNow and compares against
ohlc_downsample over the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlc_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    price_col: str,
    bucket: str = "1 hour",
    lateness: str = "10 minutes",
) -> DataFrame:
    """(key, bucket_start, bucket_end, open, high, low, close, n_ticks)
    per closed candle. `ts_col` must be a timestamp column (event time);
    rows later than `lateness` behind the watermark are dropped by Spark's
    watermark contract — the documented lateness dial."""
    tick = F.struct(F.col(ts_col).alias("ts"), F.col(price_col).alias("p"))
    return (
        events.filter(F.col(price_col).isNotNull())
        .withWatermark(ts_col, lateness)
        .groupBy(
            F.col(key_col).alias("key"), F.window(F.col(ts_col), bucket).alias("w")
        )
        .agg(
            F.min_by(F.col(price_col), tick).alias("open"),
            F.max(F.col(price_col)).alias("high"),
            F.min(F.col(price_col)).alias("low"),
            F.max_by(F.col(price_col), tick).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "key",
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
        )
    )
