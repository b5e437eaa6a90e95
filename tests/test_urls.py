"""URL hygiene functions (functions/urls.py): normalization cases, host /
registered-domain extraction, per-domain caps, and Spark<->DuckDB twin
parity of the regex chains on an adversarial fixture."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from brontes_spark.functions.urls import (
    cap_per_domain,
    url_host,
    url_normalize,
    url_registered_domain,
)

CASES = [
    # (raw, normalized, host, registered_domain)
    ("HTTP://Example.COM/Path", "http://example.com/Path", "example.com", "example.com"),
    ("https://example.com:443/a", "https://example.com/a", "example.com", "example.com"),
    ("http://example.com:80", "http://example.com/", "example.com", "example.com"),
    ("http://example.com:8080/a", "http://example.com:8080/a", "example.com", "example.com"),
    ("https://a.b.co.uk/x/", "https://a.b.co.uk/x", "a.b.co.uk", "b.co.uk"),
    ("https://x.y.example.com/p#frag", "https://x.y.example.com/p", "x.y.example.com", "example.com"),
    ("https://example.com", "https://example.com/", "example.com", "example.com"),
    ("https://example.com/", "https://example.com/", "example.com", "example.com"),
    ("https://example.com/a/b/?q=1#f", "https://example.com/a/b?q=1", "example.com", "example.com"),
    ("https://example.com?q=1", "https://example.com/?q=1", "example.com", "example.com"),
    ("https://User@Example.com/p", "https://user@example.com/p", "example.com", "example.com"),
    ("http://192.168.0.1:80/x", "http://192.168.0.1/x", "192.168.0.1", "192.168.0.1"),
    ("https://EXAMPLE.com/Q?Mixed=Case", "https://example.com/Q?Mixed=Case", "example.com", "example.com"),
    ("https://localhost/x", "https://localhost/x", "localhost", "localhost"),
    ("https://a.gov.uk/", "https://a.gov.uk/", "a.gov.uk", "a.gov.uk"),
    ("https://b.a.gov.uk/", "https://b.a.gov.uk/", "b.a.gov.uk", "a.gov.uk"),
    # trailing-slash RUNS normalize ('a//' == 'a/' == 'a' as dedup keys);
    # interior '//' is preserved (distinct resources per RFC 3986)
    ("http://x.example.com/a//", "http://x.example.com/a", "x.example.com", "example.com"),
    ("https://example.com/a//b///?q=2", "https://example.com/a//b?q=2", "example.com", "example.com"),
]


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame([(i, c[0]) for i, c in enumerate(CASES)], "i int, url string")


def test_normalize_cases(spark, fixture_df):
    got = {r.i: r.n for r in fixture_df.select("i", url_normalize(F.col("url")).alias("n")).collect()}
    for i, (_, want, _, _) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {CASES[i][0]} -> {got[i]} != {want}"


def test_host_and_domain_cases(spark, fixture_df):
    got = {
        r.i: (r.h, r.d)
        for r in fixture_df.select(
            "i",
            url_host(F.col("url")).alias("h"),
            url_registered_domain(F.col("url")).alias("d"),
        ).collect()
    }
    for i, (_, _, host, dom) in enumerate(CASES):
        assert got[i] == (host, dom), f"case {i}: {got[i]} != {(host, dom)}"


def test_normalize_idempotent(spark, fixture_df):
    once = fixture_df.select("i", url_normalize(F.col("url")).alias("n"))
    twice = once.select("i", url_normalize(F.col("n")).alias("n2"))
    rows = {r.i: (r.n, ) for r in once.collect()}
    rows2 = {r.i: (r.n2, ) for r in twice.collect()}
    assert rows == rows2


def test_duckdb_twin_parity(spark, fixture_df):
    """The documented DuckDB twins produce identical values on the fixture —
    the portability contract the module docstring claims."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE urls AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{c[0]}')" for i, c in enumerate(CASES))
        + ") t(i, url)"
    )
    sql = r"""
    WITH s1 AS (SELECT i, regexp_replace(url, '#.*$', '') AS c FROM urls),
    s2 AS (SELECT i, lower(regexp_extract(c, '^([^/]*//[^/?]*)', 1))
                     || regexp_replace(c, '^[^/]*//[^/?]*', '') AS c FROM s1),
    s3 AS (SELECT i, regexp_replace(c, '^(https://[^/:?]*):443($|[/?].*)', '\1\2') AS c FROM s2),
    s4 AS (SELECT i, regexp_replace(c, '^(http://[^/:?]*):80($|[/?].*)', '\1\2') AS c FROM s3),
    s5 AS (SELECT i, regexp_replace(c, '^([a-z+.-]+://[^/?]+(/[^?]*[^/?]))/+(\?.*)?$', '\1\3') AS c FROM s4),
    s6 AS (SELECT i, regexp_replace(c, '^([a-z+.-]+://[^/?]+)(\?.*)?$', '\1/\2') AS c FROM s5)
    SELECT i, c,
           lower(regexp_extract(url, '^[^/]*//(?:[^/@?]*@)?([^/:?#]+)', 1)) AS h
    FROM s6 JOIN urls USING (i)
    """
    duck = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    sp = {
        r.i: (r.n, r.h)
        for r in fixture_df.select(
            "i",
            url_normalize(F.col("url")).alias("n"),
            url_host(F.col("url")).alias("h"),
        ).collect()
    }
    assert sp == duck


def test_cap_per_domain(spark):
    rows = [(i, "big.com") for i in range(20)] + [(100, "small.com")]
    df = spark.createDataFrame(rows, "id long, dom string")
    out = cap_per_domain(df, "id", "dom", cap=5)
    by_dom = {
        d: sorted(r.id for r in out.collect() if r.dom == d)
        for d in ("big.com", "small.com")
    }
    assert len(by_dom["big.com"]) == 5
    assert by_dom["small.com"] == [100]
    # deterministic: same five survive on re-run
    again = sorted(r.id for r in cap_per_domain(df, "id", "dom", cap=5).collect() if r.dom == "big.com")
    assert again == by_dom["big.com"]
    with pytest.raises(ValueError):
        cap_per_domain(df, "id", "dom", cap=0)
