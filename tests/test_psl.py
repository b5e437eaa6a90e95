"""Public-Suffix-List registered-domain extraction (functions/psl.py):
file-format parser pins plus the OFFICIAL publicsuffix.org checkPublicSuffix
test vectors for every rule family the packaged snapshot carries (normal,
deep-hierarchy, wildcard, exception, unlisted-TLD default)."""

from __future__ import annotations

from brontes_spark.functions.psl import (
    PSL_SNAPSHOT,
    load_psl_rules,
    parse_psl_rules,
    psl_rules_sql_values,
    registered_domain_psl,
)


def test_parser_kinds_and_hygiene():
    rules = dict(parse_psl_rules(PSL_SNAPSHOT))
    assert rules["co.uk"] == "normal"
    assert rules["pvt.k12.ma.us"] == "normal"
    assert rules["kawasaki.jp"] == "wildcard"       # stored as the base
    assert rules["city.kawasaki.jp"] == "exception"  # stored without '!'
    assert rules["ck"] == "wildcard"
    assert rules["www.ck"] == "exception"
    # comments / blank lines skipped; no '*.'/'!' markers survive
    assert all(not n.startswith(("*", "!", "/")) for n in rules)


def test_parser_accepts_full_file_conventions():
    text = "// c\n\nFOO.BAR extra-ignored\n*.wild\n!ex.wild\nfoo.bar\n"
    got = parse_psl_rules(text)
    assert got == [("foo.bar", "normal"), ("wild", "wildcard"), ("ex.wild", "exception")]


#: (host, expected registered domain) — transcribed from the official
#: publicsuffix.org test_psl.txt vectors, restricted to snapshot rules
VECTORS = [
    # normal two-level
    ("example.com", "example.com"),
    ("www.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("com", None),  # the host IS a public suffix
    # UK second-level
    ("co.uk", None),
    ("example.co.uk", "example.co.uk"),
    ("www.example.co.uk", "example.co.uk"),
    # deep US hierarchy
    ("pvt.k12.ma.us", None),
    ("test.pvt.k12.ma.us", "test.pvt.k12.ma.us"),
    ("www.test.pvt.k12.ma.us", "test.pvt.k12.ma.us"),
    # wildcard TLD with exception
    ("ck", None),
    ("test.ck", None),           # *.ck makes test.ck itself public
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),        # !www.ck: exception to the wildcard
    ("www.www.ck", "www.ck"),
    # JP designated-city wildcard + exception
    ("kawasaki.jp", "kawasaki.jp"),  # only 'jp' matches -> ps = jp
    ("test.kawasaki.jp", None),      # *.kawasaki.jp -> itself public
    ("b.test.kawasaki.jp", "b.test.kawasaki.jp"),
    ("city.kawasaki.jp", "city.kawasaki.jp"),
    ("www.city.kawasaki.jp", "city.kawasaki.jp"),
    # unlisted TLD: implicit '*' default rule
    ("example", None),
    ("example.unlistedtld", "example.unlistedtld"),
    ("www.example.unlistedtld", "example.unlistedtld"),
    # IPv4 literal passes through
    ("192.168.0.1", "192.168.0.1"),
    # mixed case folds
    ("WwW.Example.COM", "example.com"),
]


def test_registered_domain_psl_vectors(spark):
    rules = load_psl_rules(spark)
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(VECTORS)], "i long, host string"
    )
    got = {
        r.i: r.registered_domain
        for r in registered_domain_psl(df, "host", rules).collect()
    }
    want = {i: exp for i, (_, exp) in enumerate(VECTORS)}
    assert got == want


def test_duckdb_twin_parity(spark):
    """The oracle-side PSL join (list-slice candidates + the same VALUES
    dim + score-encoded precedence) matches the Spark operator on every
    vector — the contract the staged gate's oracle relies on."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE hosts AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{h}')" for i, (h, _) in enumerate(VECTORS))
        + ") t(i, host)"
    )
    sql = f"""
    WITH rules(name, kind) AS (VALUES {psl_rules_sql_values()}),
    h AS (SELECT i, lower(host) AS h, string_split(lower(host), '.') AS labels,
                 len(string_split(lower(host), '.')) AS n
          FROM hosts),
    cand AS (
      SELECT h.i, h.h, h.n, idx.off,
             array_to_string(list_slice(labels, idx.off + 1, n), '.') AS suffix,
             CASE WHEN idx.off < n - 1
                  THEN array_to_string(list_slice(labels, idx.off + 2, n), '.')
             END AS wbase
      FROM h, LATERAL (SELECT unnest(range(0, n)) AS off) idx),
    m AS (
      SELECT c.i, c.h, c.n,
             MAX(CASE WHEN re.kind = 'exception' THEN 1000000 + (c.n - c.off - 1)
                      WHEN re.kind = 'normal' THEN c.n - c.off END) AS s_e,
             MAX(CASE WHEN rw.kind = 'wildcard' THEN c.n - c.off END) AS s_w
      FROM cand c
      LEFT JOIN rules re ON re.kind != 'wildcard' AND re.name = c.suffix
      LEFT JOIN rules rw ON rw.kind = 'wildcard' AND rw.name = c.wbase
      GROUP BY c.i, c.h, c.n),
    ps AS (
      SELECT i, h, n,
             COALESCE(GREATEST(s_e, s_w), 1) % 1000000 AS ps_labels
      FROM m)
    SELECT i,
           CASE WHEN regexp_matches(h, '^[0-9.]+$') THEN h
                WHEN n > ps_labels THEN array_to_string(
                  list_slice(string_split(h, '.'), n - ps_labels, n), '.')
           END AS registered_domain
    FROM ps
    """
    duck = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    want = {i: exp for i, (_, exp) in enumerate(VECTORS)}
    assert duck == want


def test_null_host_survives_with_null_domain(spark):
    """A NULL host must not silently drop the row (posexplode over a null
    candidate array would); it emits a NULL registered domain."""
    rules = load_psl_rules(spark)
    df = spark.createDataFrame(
        [(1, None), (2, "example.com")], "i long, host string"
    )
    got = {r.i: r.registered_domain
           for r in registered_domain_psl(df, "host", rules).collect()}
    assert got == {1: None, 2: "example.com"}
