"""Multinomial Naive Bayes: distributed training + scoring.

The workhorse classifier of corpus curation — CCNet/C4-style quality and
language filters are linear models over token counts, and NB is the
count-native member of that family: training IS aggregation, so a 100 TB
training set is one token-explode scan + two hash aggregates, nothing
iterative. Pairs with chi2_topk_terms (operators/chi2.py), which selects
the vocabulary this model then weights.

Training emits the model as EXACT integers (the gate-checkable form):

    P(term | class) = (tf + 1) / (class_tokens + V)     (Laplace)
    P(class)        = n_docs_class / n_docs

kept as (like_num, like_den) / (prior_num, prior_den) rational pairs —
no logs, no doubles, engine-exact. The model relation is O(classes x
vocab-present) rows: broadcastable for real vocabularies (1M terms x a
few classes), which is exactly what scoring wants.

Scoring joins each document token against the broadcast model and sums
log-likelihoods per (doc, class) — the one place doubles enter, and
deliberately NOT a gate surface (cross-engine log() is not guaranteed
correctly rounded; the scorer is pinned against an independent Python
reference instead). Unseen terms take the smoothed zero-count mass
1/(class_tokens + V) via the class-constant fallback, so the join stays
LEFT and sparse — the model never materializes absent (class, term)
pairs. Ties (including all-unseen-token documents) break to the
smallest class label, making the argmax deterministic.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nb_train(
    docs: DataFrame, class_col: str, tokens_col: Column
) -> DataFrame:
    """Model rows: (class, term, tf, like_num, like_den, n_docs_class,
    n_docs, class_tokens, vocab) — one per (class, term) PRESENT pair.

    Frequency semantics (multinomial): repeated tokens count. NULL-class
    docs are excluded (unlabeled data cannot train a supervised model).
    """
    base = docs.filter(F.col(class_col).isNotNull()).select(
        F.col(class_col).alias("class"), tokens_col.alias("_toks")
    )
    n_docs_class = base.groupBy("class").agg(
        F.count(F.lit(1)).alias("n_docs_class")
    )
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    occ = base.select("class", F.explode("_toks").alias("term"))
    tf = occ.groupBy("class", "term").agg(F.count(F.lit(1)).alias("tf"))
    class_tokens = tf.groupBy("class").agg(
        F.sum("tf").alias("class_tokens")
    )
    vocab = tf.select("term").distinct().agg(
        F.count(F.lit(1)).alias("vocab")
    )
    return (
        tf.join(F.broadcast(class_tokens), "class")
        .join(F.broadcast(n_docs_class), "class")
        .join(F.broadcast(vocab))
        .join(F.broadcast(n_docs))
        .select(
            "class",
            "term",
            "tf",
            (F.col("tf") + 1).alias("like_num"),
            (F.col("class_tokens") + F.col("vocab")).alias("like_den"),
            "n_docs_class",
            "n_docs",
            "class_tokens",
            "vocab",
        )
    )


def nb_classify(
    docs: DataFrame, doc_id_col: str, tokens_col: Column, model: DataFrame
) -> DataFrame:
    """(doc_id, pred_class, score) — argmax over summed log-likelihoods.

    The model relation broadcasts twice: once as the sparse (class, term)
    likelihood table, once collapsed to per-class constants (prior +
    unseen-term mass). A document with zero model-vocabulary tokens still
    classifies (priors alone), because tokens LEFT-join the model.
    """
    classes = model.groupBy("class").agg(
        F.first("n_docs_class").alias("ndc"),
        F.first("n_docs").alias("nd"),
        F.first("class_tokens").alias("ct"),
        F.first("vocab").alias("v"),
    )
    toks = docs.select(
        F.col(doc_id_col).alias("doc_id"), F.explode(tokens_col).alias("term")
    )
    # every (token, class) pair scores: seen terms use the model row,
    # unseen the class's smoothed zero mass log(1/(ct+v))
    per_tok = (
        toks.join(F.broadcast(classes.select("class", "ct", "v")))
        .join(
            F.broadcast(model.select("class", "term", "like_num", "like_den")),
            ["class", "term"],
            "left",
        )
        .select(
            "doc_id",
            "class",
            (
                F.log(F.coalesce(F.col("like_num"), F.lit(1)).cast("double"))
                - F.log((F.col("ct") + F.col("v")).cast("double"))
            ).alias("ll"),
        )
    )
    doc_class = per_tok.groupBy("doc_id", "class").agg(
        F.sum("ll").alias("token_ll")
    )
    # docs with no tokens at all: seed every (doc, class) with the prior
    prior = classes.select(
        "class",
        (F.log(F.col("ndc").cast("double")) - F.log(F.col("nd").cast("double"))).alias(
            "prior_ll"
        ),
    )
    all_docs = docs.select(F.col(doc_id_col).alias("doc_id"))
    scored = (
        all_docs.join(F.broadcast(prior))
        .join(doc_class, ["doc_id", "class"], "left")
        .select(
            "doc_id",
            "class",
            (F.col("prior_ll") + F.coalesce(F.col("token_ll"), F.lit(0.0))).alias(
                "score"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.expr("min_by(class, struct(-score, class))").alias("pred_class"),
        F.max("score").alias("score"),
    )


def nb_reference(train_rows, test_rows):
    """Independent plain-Python NB (the test oracle for the scorer) —
    deliberately NOT sharing any code path with the Spark implementation."""
    from collections import Counter, defaultdict

    tf = defaultdict(Counter)
    ndc = Counter()
    for cls, toks in train_rows:
        ndc[cls] += 1
        tf[cls].update(toks)
    vocab = {t for c in tf.values() for t in c}
    v, nd = len(vocab), sum(ndc.values())
    out = {}
    for doc_id, toks in test_rows:
        best = None
        for cls in sorted(ndc):
            den = sum(tf[cls].values()) + v
            s = math.log(ndc[cls] / nd)
            for t in toks:
                s += math.log((tf[cls][t] + 1) / den)
            if best is None or s > best[1] + 1e-12:
                best = (cls, s)
        out[doc_id] = best
    return out
