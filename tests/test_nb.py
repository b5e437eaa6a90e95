"""Naive Bayes: hand-computed model golds, scorer parity with an
independent Python reference, unseen-term and empty-doc semantics."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from brontes_spark.operators.nb import nb_classify, nb_reference, nb_train


def _train_df(spark, rows):
    return spark.createDataFrame(rows, "cls string, text string")


def _toks(col="text"):
    return F.split(F.col(col), " ")


def test_model_counts_hand_gold(spark):
    model = {
        (r["class"], r["term"]): r
        for r in nb_train(
            _train_df(spark, [("A", "x x y"), ("A", "x"), ("B", "y z")]),
            "cls",
            _toks(),
        ).collect()
    }
    r = model[("A", "x")]
    # tf(A,x)=3; class_tokens(A)=4; vocab={x,y,z}=3 -> like 4/7
    assert (r["tf"], r["like_num"], r["like_den"]) == (3, 4, 7)
    assert (r["n_docs_class"], r["n_docs"]) == (2, 3)
    assert (r["class_tokens"], r["vocab"]) == (4, 3)
    # absent pairs don't materialize (sparse model)
    assert ("B", "x") not in model
    assert model[("B", "z")]["like_den"] == 2 + 3


def test_null_class_docs_excluded(spark):
    model = nb_train(
        _train_df(spark, [("A", "x"), (None, "q q q")]), "cls", _toks()
    ).collect()
    assert {r["term"] for r in model} == {"x"}
    assert model[0]["n_docs"] == 1


def test_classifier_matches_independent_reference(spark):
    rng = random.Random(13)
    vocab_a = ["apple", "ant", "axe", "arm", "ash"]
    vocab_b = ["bat", "bee", "bog", "bun", "bid"]
    shared = ["the", "of", "and"]
    train = []
    for _ in range(30):
        train.append(
            ("A", " ".join(rng.choices(vocab_a + shared, k=rng.randint(3, 9))))
        )
        train.append(
            ("B", " ".join(rng.choices(vocab_b + shared, k=rng.randint(3, 9))))
        )
    test = [
        (i, " ".join(rng.choices(vocab_a + vocab_b + shared + ["novel"], k=6)))
        for i in range(25)
    ]
    tdf = _train_df(spark, train)
    model = nb_train(tdf, "cls", _toks())
    docs = spark.createDataFrame(test, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["pred_class"], r["score"])
        for r in nb_classify(docs, "doc_id", _toks(), model).collect()
    }
    want = nb_reference(
        [(c, t.split(" ")) for c, t in train],
        [(i, t.split(" ")) for i, t in test],
    )
    for doc_id, (cls, score) in want.items():
        assert got[doc_id][0] == cls, doc_id
        assert math.isclose(got[doc_id][1], score, rel_tol=1e-9), doc_id


def test_empty_token_doc_classifies_by_prior(spark):
    model = nb_train(
        _train_df(spark, [("A", "x"), ("A", "y"), ("B", "z")]), "cls", _toks()
    )
    docs = spark.createDataFrame([(1,)], "doc_id long").select(
        "doc_id", F.array().cast("array<string>").alias("toks")
    )
    [r] = nb_classify(docs, "doc_id", F.col("toks"), model).collect()
    # prior(A)=2/3 beats prior(B)=1/3
    assert r["pred_class"] == "A"
    assert math.isclose(r["score"], math.log(2 / 3), rel_tol=1e-12)
