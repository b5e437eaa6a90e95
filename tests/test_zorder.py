"""Z-order interleave (operators/zorder.py): bit-exact parity with a
pure-Python Morton reference and with the DuckDB twin expression; guard
rails; the locality property that makes it a clustering key."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from brontes_spark.operators.zorder import zorder_index, zorder_sql


def _py_z(vals, bits):
    z = 0
    k = len(vals)
    for i, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * k + i)
    return z


def test_matches_python_reference(spark):
    rng = random.Random(3)
    rows = [(i, rng.randrange(1 << 16), rng.randrange(1 << 16)) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, a long, b long")
    got = {r.i: r.z for r in df.select("i", zorder_index(["a", "b"], 16).alias("z")).collect()}
    want = {i: _py_z((a, b), 16) for i, a, b in rows}
    assert got == want


def test_three_columns_and_duckdb_twin(spark):
    rng = random.Random(4)
    rows = [(i, rng.randrange(1 << 10), rng.randrange(1 << 10), rng.randrange(1 << 10))
            for i in range(100)]
    df = spark.createDataFrame(rows, "i long, a long, b long, c long")
    got = {r.i: r.z for r in df.select("i", zorder_index(["a", "b", "c"], 10).alias("z")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join(map(str, rows)) + ") v(i, a, b, c)")
    duck = {r[0]: r[1] for r in con.execute(
        f"SELECT i, {zorder_sql(['a','b','c'], 10)} FROM t").fetchall()}
    assert got == duck
    assert got == {i: _py_z((a, b, c), 10) for i, a, b, c in rows}


def test_guards():
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_index(["a"], 16)
    with pytest.raises(ValueError, match="z-bits"):
        zorder_index(["a", "b"], 32)
    with pytest.raises(ValueError, match="z-bits"):
        zorder_sql(["a", "b", "c", "d"], 16)


def test_locality_beats_single_sort(spark):
    """The property the operator exists for: z-sorting a 2-D grid puts any
    small 2-D box into FEWER contiguous chunks than sorting by one key.
    Measured on a 64x64 grid cut into 64 equal chunks."""
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = df.select("a", "b", zorder_index(["a", "b"], 6).alias("k"))
    lin = df.select("a", "b", (F.col("a") * 64 + F.col("b")).alias("k"))

    def chunks_touched(keyed):
        ordered = [(r.a, r.b) for r in keyed.orderBy("k").collect()]
        touched = set()
        for pos, (x, y) in enumerate(ordered):
            if 8 <= x < 16 and 8 <= y < 16:  # an 8x8 box
                touched.add(pos // 64)  # 64 rows per chunk
        return len(touched)

    assert chunks_touched(z) < chunks_touched(lin)
