"""Sinks — reference operators S6/S8/S10 (SURVEY.md §2.1).

  * write_partitioned — MevBlocks/bundles writer (S6,
    bin/src/executors/processors/mev.rs:77-110) + parquet exporter (S8,
    brontes-db/src/parquet/mod.rs:40+): zstd parquet partitioned by a
    block-range bucket so downstream range queries prune partitions.
  * searcher_stats — S10 (processors/mev.rs:111-148): the reference upserts
    per-searcher bundle stats into libmdbx; the Spark-native formulation is
    a full recompute from the bundles table (idempotent, no merge state) —
    SURVEY.md §1.4 maps the upsert to exactly this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK_BUCKET = 100_000  # blocks per output partition


def write_partitioned(df: DataFrame, path: str, block_col: str = "block_number") -> None:
    (
        df.withColumn("block_bucket", (F.col(block_col) / BLOCK_BUCKET).cast("long"))
        .write.mode("overwrite")
        .partitionBy("block_bucket")
        .option("compression", "zstd")
        .parquet(path)
    )


def searcher_stats(bundles: DataFrame) -> DataFrame:
    """Per-searcher rollup: bundle counts by MEV type (the SearcherInfo
    `bundle_counts` map, db/searcher.rs:21) + PnL totals."""
    fam = (
        bundles.withColumn("mev_family", F.split("mev_type", ":")[0])
        .groupBy("eoa", "mev_family")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("profit_usd").alias("profit"),
            F.sum("gas_usd").alias("bribe"),
        )
    )
    return fam.groupBy("eoa").agg(
        F.sum("n").alias("n_bundles"),
        F.sum("profit").cast("decimal(38,18)").alias("total_profit_usd"),
        F.sum("bribe").cast("decimal(38,18)").alias("total_bribe_usd"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("mev_family", "n")))
        ).alias("bundle_counts"),
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    """Bucketed table writer — the co-location strategy for the engine's
    hottest repeated join keys (tx_hash between actions/tx_info, pool
    between events/state). Two tables bucketed the same way join WITHOUT a
    shuffle: Spark reads both sides already hash-distributed on the key, so
    at 100 TB the join cost drops from 2 full shuffles to 0 (the bucketed
    scan IS the exchange). Pair with `spark.sql.sources.bucketing.enabled`
    (default on) and matching n_buckets on both sides."""
    w = df.write.mode("overwrite").format("parquet").option("compression", "zstd")
    w = w.bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
