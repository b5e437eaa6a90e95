"""Skewed-key measurement for the one-shuffle funnel and retention plans
(VERDICT r6 directive 6: the funnel's per-key collect_list bound was
documented but unmeasured).

Workload: 50,000 ordinary users with ~10 stage events each, plus ONE hot
user carrying `hot` stage events (10^4 / 10^5 / 10^6). The question is
whether the per-key sorted-array fold stays linear in the hot key's event
count (array_sort is O(k log k), the fold O(k·N_stages)) and whether a
single million-event key fits executor memory (a 16-byte struct × 1e6 =
~16 MB row — large but far from any limit; the documented 100 TB contract
is that only STAGE events enter the array, so `hot` models a bot/crawler
key after prefiltering).

Prints one JSON line per configuration: wall seconds (min-of-2), the hot
user's computed stage depth, and rows out. Retention (distinct-day
per-user matrix) is measured on the same skew for comparison — its
per-key state is the distinct DAY set, bounded by the calendar, so the
hot key should cost almost nothing there.

Usage: python scripts/funnel_skew.py  (env: SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from brontes_spark.operators.funnel import funnel_stage_times

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_USERS = 50_000
PER_USER = 10
STAGES = ["view", "cart", "buy"]
DAY_NS = 86_400_000_000_000


def build_events(spark, hot: int):
    """Uniform users: PER_USER events cycling through the stages with
    increasing timestamps (so most users convert). Hot user 0 gets `hot`
    extra events, same cycling pattern, interleaved across the full time
    range — the worst case for the fold (no early exit possible)."""
    base = (
        spark.range(N_USERS * PER_USER)
        .select(
            (F.col("id") % N_USERS).alias("user_id"),
            (F.col("id") * 1_000_003).alias("ts_ns"),
            F.element_at(
                F.array(*[F.lit(s) for s in STAGES]),
                ((F.col("id") / N_USERS) % 3 + 1).cast("int"),
            ).alias("event_type"),
        )
    )
    hot_df = (
        spark.range(hot)
        .select(
            F.lit(0).cast("long").alias("user_id"),
            (F.col("id") * 997 + 13).alias("ts_ns"),
            F.element_at(
                F.array(*[F.lit(s) for s in STAGES]),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
        )
    )
    return base.unionByName(hot_df)


def timed(df):
    t0 = time.monotonic()
    n = df.count()
    return time.monotonic() - t0, n


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("funnel-skew")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    funnel_stage_times(build_events(spark, 1000), STAGES).count()

    for hot in (10, 10_000, 100_000, 1_000_000):
        ev = build_events(spark, hot)
        best = None
        for _ in range(2):
            t, n = timed(funnel_stage_times(ev, STAGES))
            best = t if best is None else min(best, t)
        hot_row = (
            funnel_stage_times(ev, STAGES)
            .filter(F.col("user_id") == 0)
            .select("stage")
            .collect()
        )
        # retention on the same skew: (user, day) distinct + cohort window
        days = ev.select(
            "user_id", (F.col("ts_ns") / DAY_NS).cast("long").alias("day")
        )
        t0 = time.monotonic()
        ret_n = (
            days.distinct()
            .groupBy("user_id")
            .agg(F.min("day").alias("cohort"), F.count("*").alias("active_days"))
            .count()
        )
        ret_t = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "hot_events": hot,
                    "funnel_sec": round(best, 2),
                    "funnel_rows": n,
                    "hot_stage": hot_row[0]["stage"] if hot_row else None,
                    "retention_sec": round(ret_t, 2),
                    "retention_rows": ret_n,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
