"""script_profile (functions/text.py): hand-computed counts on a
mixed-script fixture plus per-class Java-vs-RE2 parity (the \\p{IsX} ==
\\p{X} contract the DuckDB oracle twin relies on)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from brontes_spark.functions.text import SCRIPT_CLASSES, script_profile

FIXTURE = "abc АБВ 汉字漢 مرحبا 123 καλ ﾃｽﾄ עבר 한글 ひら"


def test_hand_counts(spark):
    df = spark.createDataFrame([(FIXTURE,)], "t string")
    prof = script_profile(F.col("t"))
    row = df.select(*[c.alias(k) for k, c in prof.items()]).collect()[0]
    assert row.n_latin == 3
    assert row.n_cyrillic == 3
    assert row.n_han == 3
    assert row.n_arabic == 5
    assert row.n_digit == 3
    assert row.n_greek == 3
    assert row.n_kana == 5   # 3 halfwidth katakana + 2 hiragana
    assert row.n_hebrew == 3
    assert row.n_hangul == 2
    assert row.n_space == 9
    assert row.n_chars_total == len(FIXTURE)
    assert row.n_other == 0  # every char in the fixture is classified


def test_java_re2_class_parity(spark):
    """Each class counts identically under Spark's Java regex and DuckDB's
    RE2 spelling — the oracle contract."""
    df = spark.createDataFrame([(FIXTURE,)], "t string")
    con = duckdb.connect()
    for name, java_pat, re2_pat in SCRIPT_CLASSES:
        sp = df.select(
            (F.length("t") - F.length(F.regexp_replace("t", java_pat, ""))).alias("c")
        ).collect()[0].c
        du = con.execute(
            f"SELECT length(?) - length(regexp_replace(?, '{re2_pat}', '', 'g'))",
            [FIXTURE, FIXTURE],
        ).fetchone()[0]
        assert sp == du, name


def test_other_is_residual(spark):
    s = "abc ☃☄"  # snowman+comet: no listed script
    df = spark.createDataFrame([(s,)], "t string")
    prof = script_profile(F.col("t"))
    row = df.select(*[c.alias(k) for k, c in prof.items()]).collect()[0]
    assert row.n_other == 2
    assert row.n_latin == 3 and row.n_space == 1
