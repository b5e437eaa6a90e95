"""Format-polymorphic table IO: the same star-schema tables over Parquet /
ORC / JSON-lines / CSV.

The reference's source layer is format-plural (libmdbx tables, ClickHouse
remotes, parquet exports — SURVEY.md §2.1/§3.3); the Spark-native analog is
one read/write pair that pivots on the DataSource format string while
keeping the engine contract identical: EXPLICIT schemas always (schema
inference is never relied on — same policy as sources/testdata.py), and a
round-trip must reproduce the source DataFrame value-for-value so every
registered plan yields identical results regardless of the storage format
(pinned by tests/test_source_formats.py).

Format notes, honestly stated:
  * parquet/orc — full fidelity (nested types, timestamps, binary); the
    production formats. Column pruning + predicate pushdown reach the scan.
  * json (lines) — nested types survive; timestamps serialize ISO-8601 and
    need timestampNTZFormat on both ends; whole-row scan (no column
    pruning) — a landing/interchange format, not an analytics one.
  * csv — FLAT schemas only (arrays/structs/maps are rejected here rather
    than silently stringified); header row written for human use but the
    read relies on the explicit schema, never the header.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..session import apply_runtime_confs

FORMATS = ("parquet", "orc", "json", "csv")

#: NTZ timestamp wire format shared by the json/csv writer and reader —
#: microsecond precision, the engine's common denominator
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _check_csv_flat(schema: StructType) -> None:
    for f in schema.fields:
        t = f.dataType.typeName()
        if t in ("array", "struct", "map"):
            raise ValueError(
                f"CSV cannot carry nested column '{f.name}' ({t}); use "
                "parquet/orc/json for nested schemas"
            )


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write `df` to `path` in `fmt` with loss-free options (see module
    docstring for each format's honest limits)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        _check_csv_flat(df.schema)
        w = w.option("header", True).option("timestampNTZFormat", _TS_FMT)
    elif fmt == "json":
        w = w.option("timestampNTZFormat", _TS_FMT)
    w.save(path)


def read_table(
    spark: SparkSession, path: str, schema: StructType | str, fmt: str = "parquet"
) -> DataFrame:
    """Read `path` as `fmt` with the EXPLICIT `schema` (DDL string or
    StructType) — inference is never used, so json/csv round-trips land on
    exactly the types the writer saw."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {FORMATS}")
    apply_runtime_confs(spark)
    r = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        r = r.option("header", True).option("timestampNTZFormat", _TS_FMT)
    elif fmt == "json":
        r = r.option("timestampNTZFormat", _TS_FMT)
    return r.load(path)
