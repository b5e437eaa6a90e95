"""JSON path extraction: parity-envelope semantics (leaf paths, array
index, missing/null), malformed-row tolerance of the typed getters."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.functions.json import json_get, json_get_double, json_get_long


def _row(spark, doc):
    df = spark.createDataFrame([(doc,)], "j string")
    return df.select(
        json_get(F.col("j"), "$.a.b[1]").alias("idx"),
        json_get(F.col("j"), "$.t").alias("t"),
        json_get(F.col("j"), "$.missing").alias("m"),
        json_get(F.col("j"), "$.n").alias("n"),
        json_get_long(F.col("j"), "$.a.b[0]").alias("i0"),
        json_get_double(F.col("j"), "$.f").alias("f"),
    ).collect()[0]


def test_envelope_semantics(spark):
    r = _row(spark, '{"a": {"b": [10, 42]}, "t": "click", "f": 1.5, "n": null}')
    assert r["idx"] == "42" and r["t"] == "click"
    assert r["m"] is None and r["n"] is None  # missing == JSON null == NULL
    assert r["i0"] == 10 and r["f"] == 1.5


def test_malformed_rows_yield_null_not_crash(spark):
    df = spark.createDataFrame(
        [('{"k": "not a number"}',), ("not json at all",), (None,)],
        "j string",
    )
    got = df.select(json_get_long(F.col("j"), "$.k").alias("k")).collect()
    assert [r["k"] for r in got] == [None, None, None]


def test_numeric_string_distinction(spark):
    # "7" (string leaf) and 7 (number leaf) both extract as text '7' and
    # cast cleanly — the documented text-normalized envelope
    df = spark.createDataFrame([('{"s": "7", "i": 7}',)], "j string")
    [r] = df.select(
        json_get_long(F.col("j"), "$.s").alias("s"),
        json_get_long(F.col("j"), "$.i").alias("i"),
    ).collect()
    assert r["s"] == 7 and r["i"] == 7
