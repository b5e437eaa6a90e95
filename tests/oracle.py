"""DuckDB-oracle comparison harness, mirroring the driver's t2 gate:
row-count + schema-shape + order-insensitive value comparison between a
Spark DataFrame and the oracle SQL run over the same parquet tables.
"""

from __future__ import annotations

import math

import duckdb

from brontes_spark.sources.testdata import TESTDATA_TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact bit-level representation: determinism policy means both
        # engines must produce the identical double
        return v.hex()
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


#: the driver's value-hash is dtype-sensitive (r1 decimal gates and r2's q12
#: HUGEINT both hash-mismatched despite equal values), so local parity must
#: reject any type drift the stringified comparison would otherwise coerce
#: away. Policy (MEMORY: driver-hash-scalars-only): gate outputs are bigint /
#: double / string / boolean only, and the oracle must produce the exact
#: corresponding arrow type.
#: r2 evidence: gates with spark int vs duckdb BIGINT outputs (x2's rank,
#: t1's l_linenumber) were driver-green, so the hash coerces across <=64-bit
#: int widths; only int128 (HUGEINT) and decimals break it.
_SPARK_TO_ARROW = {
    "bigint": {"int16", "int32", "int64"},
    "int": {"int16", "int32", "int64"},
    "double": {"double"},
    "string": {"string", "large_string"},
    "boolean": {"bool"},
}


def _check_types(spark_df, con, sql: str) -> str | None:
    arrow = con.execute(sql).fetch_arrow_table()
    du_types = {f.name: str(f.type) for f in arrow.schema}
    for name, dtype in spark_df.dtypes:
        allowed = _SPARK_TO_ARROW.get(dtype)
        if allowed is None:
            return (
                f"column {name!r} has spark type {dtype!r}, outside the "
                "bigint/double/string/boolean gate-output policy"
            )
        if name in du_types and du_types[name] not in allowed:
            return (
                f"column {name!r}: spark {dtype!r} vs duckdb arrow "
                f"{du_types[name]!r} (driver hash would mismatch)"
            )
    return None


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    sp_cols = sorted(spark_df.columns)
    sp_rows = [tuple(r) for r in spark_df.collect()]
    duck = con.execute(sql)
    du_cols = [d[0] for d in duck.description]
    du_rows = duck.fetchall()
    if sp_cols != sorted(du_cols):
        return False, f"schema mismatch: spark={sp_cols} duck={sorted(du_cols)}"
    type_err = _check_types(spark_df, con, sql)
    if type_err:
        return False, type_err
    if len(sp_rows) != len(du_rows):
        return False, f"rowcount mismatch: spark={len(sp_rows)} duck={len(du_rows)}"
    a = _norm_rows(spark_df.columns, sp_rows)
    b = _norm_rows(du_cols, du_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch; first diffs: {diffs}"
    return True, f"ok ({len(sp_rows)} rows)"
