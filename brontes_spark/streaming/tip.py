"""Chain-tip mode — the reference's streaming path (SURVEY.md §3.2):
`bin/src/executors/tip.rs:23-155` subscribes to the chain tip and runs the
identical per-block pipeline on each new block.

Spark-first: Structured Streaming over the landed `actions` table with
`foreachBatch` invoking the SAME batch functions used for historical ranges —
no second implementation of any operator. Blockchain input is strictly
ordered by block, so no watermark/late-data handling is needed for the tip
pipeline itself (SURVEY.md §2.9 streaming notes); the windowed rollup shows
the watermarked variant for genuinely unordered event streams.

Scale: each micro-batch is a set of whole blocks; state is bounded by the
multi-block window (I15) and searcher-stat accumulation (S10), both of which
are recomputable aggregations — so checkpoint recovery is trivial.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import ACTIONS_SCHEMA


def tip_stream(
    spark: SparkSession,
    actions_dir: str,
    checkpoint_dir: str,
    process: Callable[[DataFrame, int], None],
    available_now: bool = True,
):
    """Stream newly-landed action files through `process(batch_df, batch_id)`.

    `process` receives plain DataFrames, so the historical batch pipeline
    (inspectors/composer.run_composer etc.) runs unchanged per micro-batch —
    the foreachBatch pattern from SURVEY.md §3.2.
    """
    stream = (
        spark.readStream.schema(ACTIONS_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(actions_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_block_rollup(
    actions_stream: DataFrame,
    block_info: DataFrame,
    watermark: str = "120 seconds",
) -> DataFrame:
    """Watermarked sliding-window rollup over streaming actions — the
    streaming face of the I15 multi-block window: per 60s event-time window,
    swap counts and distinct pools."""
    with_ts = actions_stream.join(
        F.broadcast(block_info.select("block_number", "block_timestamp")), "block_number"
    ).withColumn("event_time", F.col("block_timestamp").cast("timestamp"))
    return (
        with_ts.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "60 seconds"), F.col("action_type"))
        .agg(F.count(F.lit(1)).alias("n_actions"))
    )
