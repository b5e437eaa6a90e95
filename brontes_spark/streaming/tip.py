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


def univ3_tip_state(
    events_stream: DataFrame,
    initial_state: DataFrame,
    snapshot_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    keep_versions: int = 2,
):
    """Tip-mode V3 pool state via `foreachBatch` running the IDENTICAL
    batch replay per micro-batch (reference tip.rs:23-155 runs the same
    pipeline at the tip; SURVEY §3.2's no-second-implementation rule):
    each batch folds its events with `pricing.univ3.univ3_pool_state`
    seeded from the per-pool snapshot the previous batch left behind.

    Exactly-once across restarts without a state store:
    * the snapshot is versioned per batch (`snapshot_dir/v=<batch_id>`) —
      a replayed batch finds its own version already present and skips;
    * per-event emissions land in `out_dir/batch=<batch_id>` with
      overwrite, so a replay rewrites the same files instead of
      duplicating rows.
    Assumes micro-batches arrive in block order (inherent to a chain-tip
    feed; see module docstring).

    Retention: a continuously-running tip pipeline would otherwise grow one
    snapshot version per micro-batch forever; after committing version N,
    all but the newest ``keep_versions`` committed versions are deleted.
    Correctness needs only v=N (batch N+1 seeds from it; a replay of batch
    N skips via `seen`; a batch N that died mid-write has no _SUCCESS and
    recomputes BEFORE any pruning of its predecessor happens) — the
    default keeps one extra version as operational margin.
    """
    from pyspark.sql import Window as W

    from ..pricing.univ3 import univ3_pool_state

    STATE_COLS = ["pool", "sqrt_price_x96", "liquidity", "tick", "r0", "r1"]

    def _versions(spark: SparkSession) -> list[int]:
        sc = spark.sparkContext
        jvm = sc._jvm  # noqa: SLF001
        hpath = jvm.org.apache.hadoop.fs.Path(snapshot_dir)
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
        if not fs.exists(hpath):
            return []
        # A version counts as committed ONLY when its _SUCCESS marker exists:
        # Spark creates v=<N> (with _temporary inside) at job START, so a
        # driver death mid-write leaves a partial directory. Without the
        # marker check a replayed batch would see batch_id in `seen`, skip,
        # and seed batch N+1's state from the corrupt snapshot — silently
        # wrong state despite the exactly-once contract.
        out = []
        for st in fs.listStatus(hpath):
            name = st.getPath().getName()
            if not name.startswith("v="):
                continue
            marker = jvm.org.apache.hadoop.fs.Path(f"{snapshot_dir}/{name}/_SUCCESS")
            if fs.exists(marker):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        seen = _versions(spark)
        if batch_id in seen:
            return  # replayed batch: snapshot (and out partition) exist
        prior = [v for v in seen if v < batch_id]
        init = (
            spark.read.parquet(f"{snapshot_dir}/v={prior[-1]}").select(*STATE_COLS)
            if prior
            else initial_state.select(*STATE_COLS)
        )
        state = univ3_pool_state(batch_df, init)
        state.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        state = spark.read.parquet(f"{out_dir}/batch={batch_id}")  # cut lineage
        w = W.partitionBy("pool").orderBy(
            F.col("block_number").desc(), F.col("tx_index").desc(),
            F.col("trace_idx").desc(),
        )
        final = (
            state.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select(
                "pool",
                F.col("sqrt_price_post").alias("sqrt_price_x96"),
                F.col("liquidity_post").alias("liquidity"),
                F.col("tick_post").alias("tick"),
                F.col("r0_post").alias("r0"),
                F.col("r1_post").alias("r1"),
            )
        )
        merged = final.unionByName(
            init.join(final.select("pool"), "pool", "left_anti")
        )
        merged.write.mode("overwrite").parquet(f"{snapshot_dir}/v={batch_id}")

        # prune committed versions beyond the retention window (only AFTER
        # this batch's _SUCCESS exists; _versions re-lists so a concurrent
        # partial dir is never touched)
        if keep_versions > 0:
            sc = spark.sparkContext
            jvm = sc._jvm  # noqa: SLF001
            fs = jvm.org.apache.hadoop.fs.Path(snapshot_dir).getFileSystem(
                sc._jsc.hadoopConfiguration()  # noqa: SLF001
            )
            for v in _versions(spark)[:-keep_versions]:
                fs.delete(jvm.org.apache.hadoop.fs.Path(f"{snapshot_dir}/v={v}"), True)

    return (
        events_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


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
