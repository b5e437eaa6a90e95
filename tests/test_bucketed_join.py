"""Bucketed co-located joins (sources/sinks.write_bucketed): two tables
bucketed on the same key must join with ZERO Exchange operators — the
scale story for the engine's repeated fact-fact join keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.sources.sinks import write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # default warehouse (static conf); unique names + DROP below clean up
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    write_bucketed(left, "b_left", "k", n_buckets=8)
    write_bucketed(right, "b_right", "k", n_buckets=8)

    # force the shuffle-join path: tiny test tables would broadcast, and
    # broadcast joins bypass bucketing entirely (at 100 TB both sides are
    # facts — SMJ is the real plan this sink exists for)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_left").join(spark.table("b_right"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle either side
        assert "SortMergeJoin" in plan
        assert j.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
