"""IVF ANN: deterministic centroid selection, cluster assignment, probing
(operators/similarity.ivf_topk)."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.operators.similarity import cosine_topk, ivf_topk
from brontes_spark.sources.testdata import load_table


def test_ivf_topk_matches_brute_force_on_probed_clusters(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") % 100 == 0
    ivf = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in ivf_topk(emb, "vec_id", "embedding", pred, k=3,
                          k_clusters=4, nprobe=4).collect()
    }
    # nprobe == k_clusters probes EVERY cluster -> must equal brute force
    bf = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in cosine_topk(emb, "vec_id", "embedding", pred, k=3).collect()
    }
    assert ivf == bf and len(ivf) > 0


def test_ivf_topk_narrow_probe_subsets_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") % 100 == 0
    rows = ivf_topk(emb, "vec_id", "embedding", pred, k=5,
                    k_clusters=8, nprobe=2).collect()
    assert len(rows) > 0
    # ANN results are genuine vectors, ranked consistently per query
    for r in rows:
        assert 1 <= r["rnk"] <= 5 and r["neighbor_id"] != r["query_id"]


def test_lsh_buckets_empty_and_null_vector_corpus(spark):
    from brontes_spark.operators.similarity import lsh_buckets

    schema = "vec_id long, embedding array<float>"
    # empty corpus: no crash, empty result (the dim peek has no row to sample)
    empty = spark.createDataFrame([], schema)
    assert lsh_buckets(empty, "vec_id", "embedding").count() == 0
    # null/empty vectors first in scan order must not poison the dim peek:
    # real vectors still bucket, null/empty ones drop (no component rows)
    rows = [(1, None), (2, []), (3, [1.0, -1.0, 0.5]), (4, [1.0, -1.0, 0.5])]
    out = {r["id"]: r["bucket"] for r in
           lsh_buckets(spark.createDataFrame(rows, schema), "vec_id", "embedding").collect()}
    assert set(out) == {3, 4}
    assert out[3] == out[4]  # identical vectors share a bucket


def test_planes_for_scale_dial():
    """planes_for holds expected bucket occupancy ~constant as N grows:
    2^planes buckets, so N / 2^planes stays in [target/2, target] (ceil)."""
    from brontes_spark.operators.similarity import planes_for

    assert planes_for(0) == 4 and planes_for(100) == 4  # floor
    for n in (5_000, 50_000, 5_000_000, 5_000_000_000):
        p = planes_for(n, target_occupancy=32)
        assert n / 2**p <= 32, (n, p)
        assert n / 2**p > 8, (n, p)  # not wildly over-partitioned
    # 10x corpus adds ~log2(10) ~ 3-4 planes
    assert 3 <= planes_for(50_000) - planes_for(5_000) <= 4


def test_semantic_dedup_planted_duplicates(spark):
    """Identical vectors always share a cluster (same assignment argmax)
    and all but the min id are dropped; orthogonal one-hot vectors are
    never near-duplicates of anything; zero vectors are excluded."""
    from brontes_spark.operators.similarity import semantic_dedup

    dim = 8
    rows = []
    dup = [0.5, 0.25, 0.0, 0.125, 0.0, 0.0, 0.0, 0.0]
    for vid in (5, 9, 12):
        rows.append((vid, dup))
    for i in range(dim):  # mutually-orthogonal one-hots
        rows.append((100 + i, [1.0 if j == i else 0.0 for j in range(dim)]))
    rows.append((999, [0.0] * dim))  # zero vector: dropped by the n2 guard
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["id"]: r for r in semantic_dedup(
        df, "vec_id", "embedding", threshold=0.95, k_clusters=4
    ).collect()}

    assert 999 not in out
    assert out[5]["kept"] and not out[9]["kept"] and not out[12]["kept"]
    assert len({out[v]["cluster"] for v in (5, 9, 12)}) == 1
    for i in range(dim):
        assert out[100 + i]["kept"]


def test_kmeans_refine_converges_on_planted_groups(spark):
    """Two tight direction-groups: after one Lloyd round every member of a
    group shares a cluster with its group-mates (the seeded sample may
    split them; the refined mean centroids cannot), output is stable
    across reruns, and iters=2 composes."""
    import random

    from brontes_spark.operators.similarity import kmeans_refine_assign

    rng = random.Random(3)
    rows = []
    for vid in range(40):
        base = [1.0, 0.0, 0.0, 0.0] if vid % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        vec = [c + rng.uniform(-0.05, 0.05) for c in base]
        rows.append((vid, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out1 = kmeans_refine_assign(df, "vec_id", "embedding", k_clusters=2, iters=1)
    got = {r["id"]: r["cluster"] for r in out1.collect()}
    evens = {got[v] for v in range(0, 40, 2)}
    odds = {got[v] for v in range(1, 40, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds

    rerun = {r["id"]: r["cluster"]
             for r in kmeans_refine_assign(
                 df, "vec_id", "embedding", k_clusters=2, iters=1).collect()}
    assert rerun == got

    out2 = kmeans_refine_assign(df, "vec_id", "embedding", k_clusters=2, iters=2)
    got2 = {r["id"]: r["cluster"] for r in out2.collect()}
    assert got2 == got  # already at the fixpoint after one round


def test_hierarchical_assign_exactness_anchor(spark):
    """With nprobe_super >= branch the two-level candidate set is every
    centroid, so the assignment EQUALS flat top-1 assignment; with
    nprobe_super=1 it still assigns every vector to some probed-super
    member (the documented approximation)."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from brontes_spark.operators.similarity import (
        _centroid_sims,
        _seeded_centroids,
        _uvectors,
        hierarchical_assign,
    )

    rng = random.Random(17)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    uv = _uvectors(df, "vec_id", "embedding")
    flat = {
        r["id"]: r["cluster"]
        for r in _centroid_sims(uv, _seeded_centroids(uv, 9))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("id").orderBy(
                    F.col("sim").desc(), F.col("cid_seed").asc())),
        )
        .filter("rn = 1")
        .select("id", F.col("cid_seed").alias("cluster"))
        .collect()
    }
    exact = {
        r["id"]: r["cluster"]
        for r in hierarchical_assign(
            df, "vec_id", "embedding", k_clusters=9,
            branch=3, nprobe_super=3,
        ).collect()
    }
    assert exact == flat

    approx = {
        r["id"]: r["cluster"]
        for r in hierarchical_assign(
            df, "vec_id", "embedding", k_clusters=9,
            branch=3, nprobe_super=1,
        ).collect()
    }
    assert set(approx) == set(flat)  # every vector still assigned
    agree = sum(1 for k in flat if approx[k] == flat[k])
    assert agree >= len(flat) // 2  # probe misses exist but are a minority


def test_semantic_dedup_hierarchical_exact_probe_equals_flat(spark):
    """semantic_dedup(hierarchical=True) with nprobe_super >= branch is
    bit-identical to the flat path (exhaustive probing == flat argmax)."""
    import random

    from brontes_spark.operators.similarity import semantic_dedup

    rng = random.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flat = {(r["id"], r["cluster"], r["kept"])
            for r in semantic_dedup(
                df, "vec_id", "embedding", threshold=0.3, k_clusters=9
            ).collect()}
    hier = {(r["id"], r["cluster"], r["kept"])
            for r in semantic_dedup(
                df, "vec_id", "embedding", threshold=0.3, k_clusters=9,
                hierarchical=True, nprobe_super=3,
            ).collect()}
    assert hier == flat


def test_kmeans_refine_hierarchical_exact_probe_equals_flat(spark):
    """kmeans_refine_assign(hierarchical=True) with nprobe_super >= branch
    is bit-identical to the flat refine loop across TWO Lloyd rounds — the
    exhaustive probe covers every centroid at every round (seeded pass plus
    both refined reassignments), so the iterative fixpoint is the same."""
    import random

    from brontes_spark.operators.similarity import kmeans_refine_assign

    rng = random.Random(31)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(90)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    flat = {(r["id"], r["cluster"], r["cluster0"])
            for r in kmeans_refine_assign(
                df, "vec_id", "embedding", k_clusters=9, iters=2
            ).collect()}
    hier = {(r["id"], r["cluster"], r["cluster0"])
            for r in kmeans_refine_assign(
                df, "vec_id", "embedding", k_clusters=9, iters=2,
                hierarchical=True, branch=3, nprobe_super=3,
            ).collect()}
    assert hier == flat

    # the approximate configuration still assigns every vector exactly once
    approx = kmeans_refine_assign(
        df, "vec_id", "embedding", k_clusters=9, iters=1,
        hierarchical=True, branch=3, nprobe_super=1,
    ).collect()
    assert len(approx) == len(flat)
    assert len({r["id"] for r in approx}) == len(flat)
