"""Format-polymorphic IO (sources/formats.py): a table written to ORC /
JSON / CSV and read back with its explicit schema must be value-identical
to the parquet source, and a registered plan must produce identical
results over any format."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from brontes_spark.sources.formats import read_table, write_table
from brontes_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.collect()
    )


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_lineitem_roundtrip_value_identical(spark, tmp_path, fmt):
    src = load_table(spark, SF_DIR, "lineitem")
    path = str(tmp_path / f"lineitem_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, src.schema, fmt)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


@pytest.mark.parametrize("fmt", ["orc", "json"])
def test_embeddings_nested_roundtrip(spark, tmp_path, fmt):
    src = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / f"emb_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, src.schema, fmt)
    assert _rows(back) == _rows(src)


def test_csv_rejects_nested(spark, tmp_path):
    src = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError):
        write_table(src, str(tmp_path / "emb_csv"), "csv")


def test_plan_result_is_format_invariant(spark, tmp_path):
    """The q1-shape aggregation over lineitem yields identical results no
    matter which format the table was stored in."""
    src = load_table(spark, SF_DIR, "lineitem")

    def q1ish(df):
        return (
            df.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("sum_qty"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    want = _rows(q1ish(src))
    assert len(want) > 0
    for fmt in ("orc", "json", "csv"):
        path = str(tmp_path / f"li_{fmt}")
        write_table(src, path, fmt)
        got = _rows(q1ish(read_table(spark, path, src.schema, fmt)))
        assert got == want, fmt
