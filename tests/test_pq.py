"""Product quantization (operators/pq.py): codebook determinism, encode
compression invariants, ADC recall against exact cosine on the real
embeddings table, and the full-rerank == exact contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from brontes_spark.operators.pq import pq_encode, pq_topk, pq_train
from brontes_spark.operators.similarity import cosine_topk

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    from brontes_spark.sources.testdata import load_table

    return load_table(spark, SF, "embeddings")


def test_train_and_encode_shapes_and_determinism(spark, emb):
    book = pq_train(emb, "vec_id", "embedding", m=8, k=16, iters=1)
    rows = book.collect()
    assert len(rows) == 8 * 16
    assert all(len(r.cvec) == 8 for r in rows)  # 64 dims / 8 subspaces
    # deterministic: retrain gives identical centroids
    again = {(r.s, r.code): tuple(r.cvec) for r in
             pq_train(emb, "vec_id", "embedding", m=8, k=16, iters=1).collect()}
    assert {(r.s, r.code): tuple(r.cvec) for r in rows} == again

    codes = pq_encode(emb, "vec_id", "embedding", book, m=8)
    n = emb.count()
    assert codes.count() == n * 8  # m codes per vector
    assert codes.groupBy("id").count().filter("count != 8").count() == 0
    assert codes.agg(F.max("code")).collect()[0][0] <= 15


def _exact_top5(emb, qid):
    from pyspark.sql import functions as F

    rows = cosine_topk(emb, "vec_id", "embedding",
                       F.col("vec_id") == qid, k=5).collect()
    return {(r.rnk, r.neighbor_id) for r in rows}


def _pq_top5_excl_self(emb, qr, rerank):
    # pq_topk takes a raw vector and naturally retrieves the query row
    # itself at rank 1 (sim 1.0); cosine_topk's contract EXCLUDES self —
    # fetch 6 and drop the self id to compare like with like
    rows = pq_topk(emb, qr.embedding, "vec_id", "embedding",
                   k_neighbors=6, rerank=rerank).collect()
    return [r.id for r in sorted(rows, key=lambda r: r.rnk)
            if r.id != qr.vec_id][:5]


def test_self_always_rank_one(spark, emb):
    """The strong-neighbor regime PQ exists for: a sim-1.0 neighbor (the
    query itself) survives even the smallest rerank at rank 1."""
    for qr in emb.orderBy("vec_id").limit(3).collect():
        top = pq_topk(emb, qr.embedding, "vec_id", "embedding",
                      k_neighbors=1, rerank=5).collect()[0]
        assert (top.id, top.rnk, top.sim) == (qr.vec_id, 1, 1.0)


@pytest.mark.slow
def test_recall_at_5_with_rerank(spark, emb):
    """This corpus is near-isotropic (max pairwise cosine ~0.51, top-5
    margins ~0.07), the WORST case for a 32x-lossy code — the contract is
    the recall/rerank dial, not magic: >= 4/5 average at rerank=100 (20%
    of the corpus; at 100 TB that dial is absolute candidate count, not a
    fraction) and >= 2/5 at rerank=20."""
    qrows = emb.orderBy("vec_id").limit(3).collect()
    for rerank, floor in ((100, 12), (20, 6)):
        hits = 0
        for qr in qrows:
            exact = {nid for _, nid in _exact_top5(emb, qr.vec_id)}
            hits += len(exact & set(_pq_top5_excl_self(emb, qr, rerank)))
        assert hits >= floor, (rerank, hits)


def test_full_rerank_equals_exact(spark, emb):
    """rerank == corpus size makes PQ a pure reorder: the (self-excluded)
    top-5 must equal the exact cosine top-5, same order."""
    n = emb.count()
    qr = emb.orderBy("vec_id").limit(1).collect()[0]
    got = _pq_top5_excl_self(emb, qr, rerank=n)
    want = [nid for _, nid in sorted(_exact_top5(emb, qr.vec_id))]
    assert got == want
