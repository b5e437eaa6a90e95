"""Compaction planning: boundary-binning semantics, oversize isolation,
the bin-total guarantee, summary face."""

from __future__ import annotations

import random

from brontes_spark.operators.compaction import (
    compaction_plan,
    compaction_summary,
)


def _plan(spark, sizes, target):
    rows = [(f"f{i}", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "file_id string, size_bytes long")
    return compaction_plan(df, "file_id", "size_bytes", target)


def test_small_files_pack_and_boundaries_cut(spark):
    # layout (size desc): 60, 40, 40, 30, 30 with target 100:
    # before-sums 0, 60, 100, 140, 170 -> bins 0, 0, 1, 1, 1
    got = {
        r["file"]: r["bin"]
        for r in _plan(spark, [40, 30, 60, 40, 30], 100).collect()
    }
    assert got == {"f2": 0, "f0": 0, "f3": 1, "f1": 1, "f4": 1}


def test_oversized_file_isolates(spark):
    # 500 >= target: sorts first, owns bins [0..4]'s span alone; the
    # smalls start exactly at the next boundary
    got = {
        r["file"]: r["bin"] for r in _plan(spark, [500, 50, 50], 100).collect()
    }
    assert got["f0"] == 0
    assert got["f1"] == 5 and got["f2"] == 5


def test_bin_totals_bounded_by_target_plus_max(spark):
    rng = random.Random(3)
    sizes = [rng.randrange(1, 120) for _ in range(200)]
    target = 256
    plan = _plan(spark, sizes, target)
    totals = {
        r["bin"]: r["total_bytes"] for r in compaction_summary(plan).collect()
    }
    assert sum(totals.values()) == sum(sizes)  # every file scheduled once
    mx = max(sizes)
    assert all(t < target + mx for t in totals.values())


def test_null_sizes_excluded(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", None)], "file_id string, size_bytes long"
    )
    got = compaction_plan(df, "file_id", "size_bytes", 100).collect()
    assert [r["file"] for r in got] == ["a"]
