"""Loaders for the driver-generated testdata star schema (TESTDATA.md).

Mirrors the reference's source layer (SURVEY.md §2.1 S1/S2): all inputs are
columnar tables read with explicit, static schemas — schema inference is never
relied on, matching the reference's fixed Rust-struct/ClickHouse-DDL schemas
(`crates/brontes-database/brontes-db/src/clickhouse/tables/*.sql`).

Scale notes: every reader is a plain parquet scan, so Catalyst pushes filters
and prunes columns into the scan (check `.explain` → PushedFilters/ReadSchema).
At 100 TB the same call reads a partitioned table directory; nothing here
assumes single-file inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts_ns` (epoch nanoseconds, bigint).

    The parquet stores TIMESTAMP(NANOS); with nanosAsLong the column arrives
    as a raw nanosecond bigint, which is exactly the reference's convention of
    integer microsecond timestamps for CEX data (SURVEY.md §1.2) — we keep
    nanoseconds and derive coarser grains with integer division.
    """
    df = load_table(spark, sf_dir, "events")
    if dict(df.dtypes)["ts"] in ("bigint", "long"):
        # truncate to microsecond precision: DuckDB (the oracle engine) reads
        # TIMESTAMP(NANOS) parquet by truncating to its µs TIMESTAMP, so sub-µs
        # digits must not leak into either side's arithmetic
        return df.withColumn(
            "ts_ns", (F.col("ts").cast("long") - F.col("ts").cast("long") % 1000)
        ).drop("ts")
    # fallback: session without the legacy flag reads it as timestamp
    return df.withColumn(
        "ts_ns", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("long")
    ).drop("ts")
