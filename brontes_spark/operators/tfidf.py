"""TF-IDF document-term weighting — the classic text-pipeline ranking
signal (salient terms per document, feature vectors for linear models,
keyword extraction for corpus curation).

Two variants share one plan shape (token explode -> per-(doc,term) count ->
broadcast-joined document-frequency dim):

* `tfidf_terms(..., rational=True)` emits `score9` = floor(tf * (N+1) /
  (df+1) * 10^9) as an EXACT DECIMAL(38,0) — integer `div` truncates
  identically in both engines (the KMV-gate pattern; Spark's native
  decimal division caps the result scale at 6 and would silently lose
  digits), so a DuckDB oracle can hash-match it. Divide by 1e9 for
  display. The log damping of textbook tf-idf is a presentation choice;
  the rational score preserves per-term document ranking exactly
  (monotone in tf for fixed term, monotone in 1/df for fixed tf).
* `rational=False` scores tf * (ln((N+1)/(df+1)) + 1) — the
  sklearn-smoothed convention for consumers that expect log damping.
  Cross-engine float-log bit-identity is NOT guaranteed (libm vs libm),
  so this variant is pytest-pinned, never oracle-hashed.

Scale shape: ONE token scan — tf is one hash agg on (doc, term) and the
document frequency is a count window over the SAME relation partitioned by
term (a groupBy+re-join formulation plan-audits to three scans of the
corpus because ReuseExchange does not fire across the join branches; the
window formulation is one scan + the unavoidable (doc,term) -> term -> doc
exchange chain). The 1-row corpus-size dim joins on a literal key. Top-k
per doc uses the rank<=k window that compiles to Partial+Final
WindowGroupLimit (map-side bounded, the KMV gate pattern — plan-audited).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import ws_tokens


def tfidf_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rational: bool = True,
) -> DataFrame:
    """(doc_id, term, tf, df, score9|score): every (document, term) pair
    with its term count, document frequency, and tf-idf score — `score9`
    (exact scaled-integer decimal) when rational=True, float `score` when
    not (see module note). Documents with no tokens emit no rows but still
    count toward N (an empty document is corpus evidence)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ws_tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency as a window over tf itself: one lineage, one scan
    tf_df = tf.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("term"))
    )
    n_docs = df.select(F.col(id_col).alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # 1-row corpus-size dim joined on a literal key (a keyless join would
    # be a cartesian product, which this codebase bans even for 1 row)
    joined = (
        tf_df.withColumn("j", F.lit(1))
        .join(F.broadcast(n_docs.withColumn("j", F.lit(1))), "j")
        .drop("j")
    )
    if rational:
        # tf*(N+1)*1e9 stays far below 38 digits (tf<=doc len, N<=corpus);
        # `div` truncates toward zero in both engines
        score = F.expr(
            "CAST(tf AS DECIMAL(38,0)) * CAST(n_docs + 1 AS DECIMAL(38,0)) "
            "* CAST(1000000000 AS DECIMAL(38,0)) div CAST(df + 1 AS DECIMAL(38,0))"
        ).alias("score9")
    else:
        score = (
            F.col("tf")
            * (
                F.log(
                    (F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)
                )
                + F.lit(1.0)
            )
        ).alias("score")
    return joined.select("doc_id", "term", "tf", "df", score)


def tfidf_topk_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    rational: bool = True,
) -> DataFrame:
    """(doc_id, rnk, term, score9|score): each document's k highest-scoring
    terms, ties broken lexicographically — deterministic on any
    partitioning (score9's 1e-9 truncation grid can only MERGE scores into
    ties, which the term tie-break then resolves identically in both
    engines)."""
    scored = tfidf_terms(df, id_col, text_col, rational=rational)
    score_col = "score9" if rational else "score"
    w = W.partitionBy("doc_id").orderBy(
        F.col(score_col).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "rnk", "term", score_col)
    )
