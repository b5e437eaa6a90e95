"""Tip-mode streaming + sink tests: the historical batch pipeline must run
unchanged inside foreachBatch (SURVEY.md §3.2), and the sinks must
round-trip with partition pruning."""

from __future__ import annotations

import tempfile
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from brontes_spark.sources.fixtures import load_fixtures
from brontes_spark.sources.sinks import searcher_stats, write_partitioned
from brontes_spark.streaming.tip import tip_stream


def test_tip_stream_runs_batch_pipeline(spark):
    tables = load_fixtures(spark)
    with tempfile.TemporaryDirectory() as tmp:
        actions_dir, ckpt = f"{tmp}/actions", f"{tmp}/ckpt"
        # land each block as its own file — the tip produces one block at a time
        tables["actions"].repartition("block_number").write.parquet(actions_dir)

        seen: list[tuple[int, int]] = []

        def process(batch_df, batch_id):
            # the identical batch operators run per micro-batch
            per_block = (
                batch_df.groupBy("block_number")
                .agg(F.count(F.lit(1)).alias("n_actions"))
                .collect()
            )
            seen.extend((r["block_number"], r["n_actions"]) for r in per_block)

        q = tip_stream(spark, actions_dir, ckpt, process)
        q.awaitTermination(120)
        totals = {}
        for bn, n in seen:
            totals[bn] = totals.get(bn, 0) + n
        assert totals == {
            100: 6, 101: 4, 102: 3, 103: 1, 104: 1,
            107: 5, 108: 6, 109: 5, 110: 1,
        }


def test_write_partitioned_and_prune(spark):
    tables = load_fixtures(spark)
    with tempfile.TemporaryDirectory() as tmp:
        write_partitioned(tables["tx_info"], f"{tmp}/tx_info")
        back = spark.read.parquet(f"{tmp}/tx_info")
        assert back.count() == tables["tx_info"].count()
        assert "block_bucket=0" in str(
            back.filter(F.col("block_number") == 100).explain(extended=False) or ""
        ) or back.filter(F.col("block_number") == 100).count() == 4


def test_searcher_stats_recompute(spark):
    rows = [
        (100, ["a"], "0xs1", None, "sandwich", Decimal(88), Decimal(90), Decimal(2)),
        (101, ["b"], "0xs1", None, "atomic_arb:triangle", Decimal(49), Decimal(50), Decimal(1)),
        (102, ["c"], "0xs2", None, "jit", Decimal(4), Decimal(6), Decimal(2)),
    ]
    from brontes_spark.schemas import BUNDLES_SCHEMA

    bundles = spark.createDataFrame(rows, BUNDLES_SCHEMA)
    stats = {r["eoa"]: r.asDict() for r in searcher_stats(bundles).collect()}
    assert stats["0xs1"]["n_bundles"] == 2
    assert stats["0xs1"]["total_profit_usd"] == Decimal(137)
    assert stats["0xs1"]["bundle_counts"] == {"sandwich": 1, "atomic_arb": 1}
    assert stats["0xs2"]["bundle_counts"] == {"jit": 1}


def test_searcher_stats_incremental_upsert(spark):
    """S10 tip mode (processors/mev.rs:111-148): two consecutive micro-batches
    merge into block-grain stats; a replayed batch changes nothing
    (idempotent); the rollup equals the full-recompute batch path."""
    from brontes_spark.schemas import BUNDLES_SCHEMA
    from brontes_spark.sources.sinks import (
        searcher_block_stats,
        searcher_stats_rollup,
        upsert_searcher_block_stats,
    )

    batch1 = spark.createDataFrame(
        [
            (100, ["a"], "0xs1", None, "sandwich", Decimal(88), Decimal(90), Decimal(2)),
            (101, ["b"], "0xs1", None, "atomic_arb:triangle", Decimal(49), Decimal(50), Decimal(1)),
        ],
        BUNDLES_SCHEMA,
    )
    batch2 = spark.createDataFrame(
        [
            (102, ["c"], "0xs2", None, "jit", Decimal(4), Decimal(6), Decimal(2)),
            (102, ["d"], "0xs1", None, "jit", Decimal(10), Decimal(11), Decimal(1)),
        ],
        BUNDLES_SCHEMA,
    )
    state = searcher_block_stats(batch1)
    state = upsert_searcher_block_stats(state, batch2)
    rolled = {r["eoa"]: r.asDict() for r in searcher_stats_rollup(state).collect()}
    assert rolled["0xs1"]["n_bundles"] == 3
    assert rolled["0xs1"]["total_profit_usd"] == Decimal(147)
    assert rolled["0xs1"]["bundle_counts"] == {"atomic_arb": 1, "jit": 1, "sandwich": 1}
    assert rolled["0xs2"]["bundle_counts"] == {"jit": 1}

    # replaying batch2 (at-least-once delivery) must be a no-op
    replayed = upsert_searcher_block_stats(state, batch2)
    assert sorted(map(tuple, replayed.collect())) == sorted(map(tuple, state.collect()))

    # the incremental rollup must equal the batch-path full recompute
    full = {r["eoa"]: r.asDict()
            for r in searcher_stats(batch1.unionByName(batch2)).collect()}
    assert rolled == full
