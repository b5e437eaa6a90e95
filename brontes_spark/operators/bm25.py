"""Okapi BM25 retrieval scoring — the lexical-search ranking function
(Robertson & Spärck Jones probabilistic relevance framework; the Lucene/
Elasticsearch default) a corpus pipeline needs for query-based curation,
hard-negative mining, and RAG retrieval baselines.

Two variants share one plan shape, the tfidf.py convention:

* `rational=True` (the oracle-checkable gate form): with k1 = 6/5 and
  b = 3/4 (the textbook 1.2 / 0.75 defaults as exact rationals), each
  per-term contribution

      idf_rat(t) * tf_sat(t, D)
        = (2N - 2df + 1) / (2df + 1)
          * 44 * tf * L / (20 * tf * L + 6 * L + 18 * dl * N)

  is a ratio of integers (L = total corpus tokens, N = docs, dl = doc
  length; derived by clearing k1/b/avgdl denominators, avgdl = L/N), so
  `score9` = SUM over query terms of floor(1e9 * contribution) is an
  exact DECIMAL(38,0) both engines truncate identically. Precision
  envelope: the numerator 44 * tf * L * (2N+1) * 1e9 must stay below
  10^38, i.e. tf * L * N < ~1.1e27 — comfortable to ~10^12 tokens with
  ~10^9 docs; at a full 100 TB corpus (10^13+ tokens) drop the 1e9 scale
  to 1e6 or compute per-shard L (both preserve ranking). The ln of the
  classic Robertson idf is monotone, so SINGLE-term rankings are
  identical to the classic form; multi-term sums weight rare terms more
  steeply than ln does — a documented variant, chosen because cross-engine
  float-ln bit-identity cannot be guaranteed (the tfidf.py finding).
* `rational=False`: the classic Lucene form
  ln(1 + (N - df + 0.5)/(df + 0.5)) * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
  as doubles — pytest-pinned (ranking sanity, hand-computed goldens),
  never oracle-hashed.

Scale shape: ONE corpus token scan -> tf hash agg on (doc, term); doc
length and document frequency as windows over that SAME relation (the
tfidf.py plan-audit: groupBy+re-join re-scans the corpus, windows do
not); the (N, L) corpus dim is 1 row joined on a literal key; the QUERY
relation (small by construction) broadcast-joins on term, so the corpus
never shuffles on anything but its own (doc, term) -> term -> (query,
doc) chain; top-k per query is the rank<=k window that compiles to
Partial+Final WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import ws_tokens


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    query_id_col: str = "query_id",
    query_term_col: str = "term",
    rational: bool = True,
) -> DataFrame:
    """(query_id, doc_id, n_hit, score9|score): BM25 of every document
    matching at least one query term. `queries` is (query_id, term) with
    terms pre-tokenized and DISTINCT per query (duplicate query terms
    would double-count; callers tokenizing free text dedup first).
    `n_hit` = how many of the query's terms the document contains."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ws_tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    enriched = tf.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("term"))
    ).withColumn("dl", F.sum("tf").over(W.partitionBy("doc_id")))
    corpus = docs.agg(F.count(F.lit(1)).alias("n_docs")).withColumn("j", F.lit(1))
    total = toks.agg(F.count(F.lit(1)).alias("l_tokens")).withColumn("j", F.lit(1))
    dim = corpus.join(total, "j").drop("j")
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_term_col).alias("term")
    )
    hits = (
        enriched.join(F.broadcast(q), "term")
        .withColumn("j", F.lit(1))
        .join(F.broadcast(dim.withColumn("j", F.lit(1))), "j")
        .drop("j")
    )
    if rational:
        # all-integer per-term contribution, floored to the 1e-9 grid
        # BEFORE the sum so partial aggregation order cannot matter
        contrib = F.expr(
            "CAST(44 AS DECIMAL(38,0)) * tf * l_tokens"
            " * (2 * CAST(n_docs AS DECIMAL(38,0)) - 2 * df + 1)"
            " * CAST(1000000000 AS DECIMAL(38,0))"
            " div ((CAST(20 AS DECIMAL(38,0)) * tf * l_tokens"
            "       + 6 * CAST(l_tokens AS DECIMAL(38,0))"
            "       + 18 * CAST(dl AS DECIMAL(38,0)) * n_docs)"
            "      * (2 * CAST(df AS DECIMAL(38,0)) + 1))"
        )
        out = hits.withColumn("c9", contrib).groupBy("query_id", "doc_id").agg(
            F.count(F.lit(1)).alias("n_hit"),
            F.sum("c9").cast("decimal(38,0)").alias("score9"),
        )
    else:
        avgdl = F.col("l_tokens").cast("double") / F.col("n_docs")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        sat = (F.col("tf") * 2.2) / (
            F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / avgdl)
        )
        out = hits.withColumn("c", idf * sat).groupBy("query_id", "doc_id").agg(
            F.count(F.lit(1)).alias("n_hit"),
            F.sum("c").alias("score"),
        )
    return out


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    rational: bool = True,
) -> DataFrame:
    """(query_id, rnk, doc_id, n_hit, score9|score): each query's k
    best-scoring documents, ties broken by doc_id ascending — deterministic
    on any partitioning (the score9 truncation grid can only merge scores
    into ties, which doc_id then resolves identically in both engines)."""
    scored = bm25_scores(docs, queries, id_col, text_col, rational=rational)
    score_col = "score9" if rational else "score"
    w = W.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "doc_id", "n_hit", score_col)
    )
