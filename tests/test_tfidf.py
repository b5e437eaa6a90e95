"""TF-IDF operator (operators/tfidf.py): closed-form golds, partitioning
invariance, top-k determinism, and the DuckDB rational-score parity that an
r8 driver gate will pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.operators.tfidf import tfidf_terms, tfidf_topk_terms

DOCS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "apple cherry cherry date"),
    (4, ""),  # counts toward N, emits no term rows
]
DDL = "doc_id long, text string"


def test_tfidf_rational_closed_form(spark):
    df = spark.createDataFrame(DOCS, DDL)
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], int(r["score9"]))
        for r in tfidf_terms(df, "doc_id", "text").collect()
    }
    n = len(DOCS)
    dfreq = {"apple": 2, "banana": 2, "cherry": 2, "date": 1}
    want_tf = {
        (1, "apple"): 2, (1, "banana"): 1,
        (2, "banana"): 1, (2, "cherry"): 1,
        (3, "apple"): 1, (3, "cherry"): 2, (3, "date"): 1,
    }
    assert set(got) == set(want_tf)
    for (d, t), tf in want_tf.items():
        gtf, gdf, score9 = got[(d, t)]
        assert (gtf, gdf) == (tf, dfreq[t])
        # score9 = floor(tf*(N+1)/(df+1) * 1e9), exact integer truncation
        assert score9 == (tf * (n + 1) * 10**9) // (dfreq[t] + 1)


def test_tfidf_topk_and_partitioning_invariance(spark):
    import random

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randrange(3, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, DDL)
    base = {
        (r["doc_id"], r["rnk"], r["term"], str(r["score9"]))
        for r in tfidf_topk_terms(df, "doc_id", "text", k=3).collect()
    }
    for parts in (1, 13):
        again = {
            (r["doc_id"], r["rnk"], r["term"], str(r["score9"]))
            for r in tfidf_topk_terms(
                df.repartition(parts), "doc_id", "text", k=3
            ).collect()
        }
        assert again == base
    # every doc with tokens has exactly min(k, n_distinct_terms) rows
    per_doc: dict = {}
    for d, rnk, _, _ in base:
        per_doc[d] = max(per_doc.get(d, 0), rnk)
    n_terms = {
        r["doc_id"]: r["n"]
        for r in tfidf_terms(df, "doc_id", "text")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for d, top in per_doc.items():
        assert top == min(3, n_terms[d])


def test_tfidf_log_variant_matches_python(spark):
    import math

    df = spark.createDataFrame(DOCS, DDL)
    got = {
        (r["doc_id"], r["term"]): r["score"]
        for r in tfidf_terms(df, "doc_id", "text", rational=False).collect()
    }
    n = len(DOCS)
    dfreq = {"apple": 2, "banana": 2, "cherry": 2, "date": 1}
    for (d, t), score in got.items():
        tf = 2 if (d, t) in ((1, "apple"), (3, "cherry")) else 1
        want = tf * (math.log((n + 1) / (dfreq[t] + 1)) + 1.0)
        assert abs(score - want) < 1e-12


def test_tfidf_rational_duckdb_parity(spark):
    """The r8-gate shape: DuckDB recomputes the rational pipeline and the
    9-dp scores hash-match exactly."""
    import duckdb
    import random

    rng = random.Random(17)
    vocab = [f"t{i}" for i in range(50)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randrange(1, 25))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, DDL)
    got = {
        (r["doc_id"], r["term"], r["tf"], r["df"], str(int(r["score9"])))
        for r in tfidf_terms(df, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = {
        (r[0], r[1], r[2], r[3], str(r[4]))
        for r in con.execute(
            """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x != '')) AS term
              FROM docs),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
            dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
            nd AS (SELECT COUNT(*) AS n_docs FROM docs)
            SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                   CAST(tf.tf AS HUGEINT) * (nd.n_docs + 1) * 1000000000
                     // (dfreq.df + 1) AS score9
            FROM tf JOIN dfreq USING (term) CROSS JOIN nd
            """
        ).fetchall()
    }
    assert got == want and got
