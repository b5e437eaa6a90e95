"""Window kernels backing several reference operators (SURVEY.md §2):

  * grid_downsample — S3: nearest-sample-per-grid-cell downsampling, the CEX
    quote 1-second grid (`clickhouse/queries/raw_cex_quotes.sql` argMin).
  * rank_by_group   — S4: per-group ranking by measure (most-liquid-exchange,
    `queries/most_volume_pair_exchange.sql`).
  * keep_largest    — A7/O3: keep the dominant row per key (bundle dedup,
    `mev_inspectors/shared_utils.rs:655-710`; composer precedence
    `composer/mev_filters.rs:32-110`).
  * window_dedup    — C9: duplicate elimination keeping the first occurrence
    (`tree_builder/tree_pruning.rs` remove_possible_transfer_double_counts).

All are single-shuffle window/group plans; determinism comes from total
orderings (every orderBy ends in a unique id column).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def grid_downsample(
    df: DataFrame,
    keys: Sequence[str],
    grid: Column,
    distance: Column,
    tiebreak: str,
) -> DataFrame:
    """One row per (keys, grid cell): the row minimizing (distance, tiebreak)."""
    d = df.withColumn("__cell", grid).withColumn("__dist", distance)
    w = W.partitionBy(*keys, "__cell").orderBy(F.col("__dist").asc(), F.col(tiebreak).asc())
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__dist")
        .withColumnRenamed("__cell", "grid_cell")
    )


def rank_by_group(
    df: DataFrame,
    keys: Sequence[str],
    measure: Column,
    tiebreak: str,
    top_k: int | None = None,
    rank_col: str = "rnk",
) -> DataFrame:
    order = [measure.desc(), F.col(tiebreak).asc()]
    w = W.partitionBy(*keys).orderBy(*order) if keys else W.orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w))
    # `is not None`, not truthiness: top_k=0 legitimately means zero rows
    return out.filter(F.col(rank_col) <= top_k) if top_k is not None else out


def keep_largest(
    df: DataFrame, keys: Sequence[str], measure: Column, tiebreak: str
) -> DataFrame:
    """Dominant-row-per-key: rank desc by measure, tiebreak asc, keep rank 1."""
    w = W.partitionBy(*keys).orderBy(measure.desc(), F.col(tiebreak).asc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def window_dedup(df: DataFrame, keys: Sequence[str], order: Sequence[str]) -> DataFrame:
    """Keep the first row per key set under the (ascending) ordering."""
    w = W.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def ohlc_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    price_col: str,
    bucket_ns: int,
    qty_col: str | None = None,
) -> DataFrame:
    """OHLC candle downsampling — the finance-native grid reduction
    (S3's grid_downsample keeps last-tick-per-cell; candles keep the
    open/high/low/close envelope plus volume/vwap, which is what CEX
    trade feeds aggregate to at storage time).

    (key, bucket_start, open, high, low, close, n_ticks[, volume, vwap9])
    per `bucket_ns` cell. Open/close are the first/last tick by
    (ts, price) — the price tie-break makes duplicate-timestamp feeds
    deterministic in both engines (max_by/min_by on the same composite).
    One hash aggregate, no window: min/max_by(struct) give the endpoint
    prices map-side, so each task emits one row per touched cell.

    With `qty_col`: volume = exact decimal qty sum; vwap9 = the
    9dp-scaled integer VWAP (sum(p*q) div sum(q) on the micro-grid),
    engine-portable like every other rational in the repo.
    """
    if bucket_ns < 1:
        raise ValueError(f"bucket_ns must be >= 1, got {bucket_ns}")
    bucket = (F.col(ts_col).cast("long") - F.pmod(F.col(ts_col).cast("long"), F.lit(bucket_ns))).alias(
        "bucket_start"
    )
    tick = F.struct(F.col(ts_col).cast("long").alias("ts"), F.col(price_col).alias("p"))
    aggs = [
        F.min_by(F.col(price_col), tick).alias("open"),
        F.max(F.col(price_col)).alias("high"),
        F.min(F.col(price_col)).alias("low"),
        F.max_by(F.col(price_col), tick).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    ]
    if qty_col is not None:
        # exact integer math on the 9dp grid: p,q quantized upstream or
        # integral already; sum(p*q) div sum(q) truncates identically in
        # both engines
        aggs += [
            F.sum(F.col(qty_col).cast("decimal(38,0)")).cast("long").alias("volume"),
            F.expr(
                f"CAST(sum(CAST({price_col} AS DECIMAL(38,0)) * {qty_col}) "
                f"div nullif(sum(CAST({qty_col} AS DECIMAL(38,0))), 0) AS BIGINT)"
            ).alias("vwap9"),
        ]
    return (
        df.filter(F.col(price_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"), bucket)
        .agg(*aggs)
    )
