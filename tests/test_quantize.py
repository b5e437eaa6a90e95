"""int8 scalar quantization + quantize-then-rerank ANN
(operators/quantize.py): code-range/reconstruction invariants, lossless
grids, determinism, and measured recall vs the exact path on the real
embeddings table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from brontes_spark.operators.quantize import ann_quantized_topk, quantize_int8
from brontes_spark.operators.similarity import cosine_topk


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_codes_in_range_and_extremes_exact(spark):
    df = _emb(spark, [(1, [0.0, -1.0]), (2, [0.5, 0.0]), (3, [1.0, 1.0])])
    out = {r.id: (r.qvec, r.rvec) for r in quantize_int8(df, "vec_id", "embedding").collect()}
    for q, r in out.values():
        assert all(0 <= c <= 255 for c in q)
    # per-dim min encodes to 0 and reconstructs exactly; max to 255 exactly
    assert out[1][0][0] == 0 and out[1][1][0] == 0          # dim0 min = 0.0
    assert out[3][0][0] == 255 and out[3][1][0] == 1_000_000  # dim0 max = 1.0
    assert out[1][0][1] == 0 and out[1][1][1] == -1_000_000   # dim1 min = -1.0


def test_constant_dimension_reconstructs_exactly(spark):
    df = _emb(spark, [(1, [0.25, 1.0]), (2, [0.25, -1.0])])
    out = {r.id: r.rvec for r in quantize_int8(df, "vec_id", "embedding").collect()}
    assert out[1][0] == 250_000 and out[2][0] == 250_000


def test_reconstruction_error_bounded(spark):
    # error per dim <= (mx-mn)/255 micro-units by construction
    rows = [(i, [i / 100.0, 1.0 - i / 100.0]) for i in range(101)]
    df = _emb(spark, rows)
    rows_out = quantize_int8(df, "vec_id", "embedding").collect()
    step = 1_000_000 // 255 + 1
    orig = {i: [int(round(v * 1e6)) for v in vec] for i, vec in rows}
    for r in rows_out:
        for pos, rv in enumerate(r.rvec):
            assert abs(rv - orig[r.id][pos]) <= step


def test_quantized_equals_exact_when_rerank_covers_corpus(spark):
    rows = [(i, [float((i * 7) % 13) / 13, float((i * 5) % 11) / 11, 0.3]) for i in range(40)]
    df = _emb(spark, rows)
    pred = F.col("vec_id") % 10 == 0
    exact = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in cosine_topk(df, "vec_id", "embedding", pred, k=3).collect()
    }
    quant = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in ann_quantized_topk(df, "vec_id", "embedding", pred, k=3, rerank=100).collect()
    }
    assert quant == exact  # full-corpus rerank == exact search


def test_recall_on_real_embeddings(spark, sf_dir):
    from brontes_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") % 50 == 0
    exact = cosine_topk(emb, "vec_id", "embedding", pred, k=5).collect()
    quant = ann_quantized_topk(emb, "vec_id", "embedding", pred, k=5, rerank=20).collect()
    ex = {(r.query_id, r.neighbor_id) for r in exact}
    qu = {(r.query_id, r.neighbor_id) for r in quant}
    recall = len(ex & qu) / len(ex)
    # deterministic on fixed testdata: pin a floor well under the observed
    # value so regenerated fixtures don't flap, but real regressions fail
    assert recall >= 0.9, f"recall@5 dropped to {recall}"


def test_determinism(spark):
    rows = [(i, [((i * 13) % 7) / 7.0, ((i * 3) % 5) / 5.0]) for i in range(30)]
    df = _emb(spark, rows)
    a = sorted(tuple(r) for r in quantize_int8(df, "vec_id", "embedding").collect())
    b = sorted(tuple(r) for r in quantize_int8(df, "vec_id", "embedding").collect())
    assert a == b


def test_bad_rerank(spark):
    df = _emb(spark, [(1, [0.1])])
    with pytest.raises(ValueError):
        ann_quantized_topk(df, "vec_id", "embedding", F.lit(True), k=5, rerank=3)
