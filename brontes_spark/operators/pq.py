"""Product quantization (PQ) ANN — the top of the engine's compression
ladder (exact → LSH → IVF → int8 scalar → PQ). Jégou, Douze & Schmid 2011
("Product Quantization for Nearest Neighbor Search"): split d dims into m
subspaces, learn a tiny codebook per subspace, store each vector as m
small codes — at m=8 codes over 64 dims that is 8 bytes/vector vs 256
(32x), and asymmetric distance computation (ADC) scans CODES against a
per-query lookup table instead of floats.

Relational re-expression, exact-integer throughout (the similarity.py
micro-unit convention, so training/encoding are deterministic and
partitioning-invariant):

  * train: per (subspace, centroid-candidate) — seeds are md5-ranked
    sample vectors (the _seeded_centroids pattern), then `iters` Lloyd
    rounds run AS ONE DATAFRAME across all subspaces at once (subspace is
    just a grouping key: assignment is a broadcast join against the
    m*k-row codebook dim, update one groupBy mean with integer div) — m
    separate k-means collapsed into one plan;
  * encode: nearest centroid per (vector, subspace) → (id, codes);
  * search: the query builds an m*k-row LUT of exact integer partial
    SQUARED L2 distances; candidate distance = sum of m LUT hits (one
    broadcast join + groupBy), top-C by ADC distance, then EXACT rerank
    of the C candidates against the original vectors — the same
    recall-knob contract as quantize_int8 (C >> k approaches exact
    recall; pinned in tests).

Codebooks are bounded dims (m * k rows), never data-sized; the one
corpus-scale relation is (id, subspace, code) at m rows per vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .similarity import _uvectors


def _unit(df: DataFrame, vec_col: str) -> DataFrame:
    """Replace `vec_col` with its unit-normalized form. PQ trains and
    scans in SQUARED-L2 space, but the engine's ANN contract ranks by
    COSINE — on unit vectors they are monotone twins (d^2 = 2 - 2*cos),
    so normalizing first is what makes ADC candidates valid cosine
    candidates. Zero vectors drop (no direction to encode), matching
    _uvectors' n2 > 0 guard."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return (
        df.withColumn("_nrm", norm)
        .filter(F.col("_nrm") > 0)
        .withColumn(
            vec_col,
            F.transform(F.col(vec_col), lambda x: (x.cast("double") / F.col("_nrm")).cast("float")),
        )
        .drop("_nrm")
    )


def _subvectors(uv: DataFrame, m: int, dsub: int) -> DataFrame:
    """(id, s, sv array<long>) — each micro-unit vector split into m
    subspaces of dsub dims."""
    subs = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.struct(
                s.cast("int").alias("s"),
                F.slice("uvec", s * dsub + 1, dsub).alias("sv"),
            ),
        )
    ).alias("sub")
    return uv.select("id", subs).select("id", "sub.s", "sub.sv")


def _sqdist(a, b):
    """Exact integer squared L2 between micro-unit long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
) -> DataFrame:
    """The codebook: (s, code, cvec array<long>) with m*k rows — subspace s,
    code id in [0, k), centroid on the micro-unit grid. Deterministic:
    md5-ranked seed vectors, integer-mean Lloyd updates (div truncation),
    re-codes assigned by (distance, code) so ties break identically on any
    partitioning."""
    uv = _uvectors(_unit(df, vec_col), id_col, vec_col)
    dim = uv.select(F.size("uvec").alias("d")).limit(1).collect()[0]["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    dsub = dim // m
    sv = _subvectors(uv, m, dsub).localCheckpoint(eager=False)

    seeds = (
        uv.select("id")
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(k)
        .withColumn("code", (F.row_number().over(
            W.orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        ) - 1).cast("int"))
    )
    book = (
        sv.join(F.broadcast(seeds), "id")
        .select("s", "code", F.col("sv").alias("cvec"))
    )
    for _ in range(iters):
        assigned = (
            sv.join(F.broadcast(book), "s")
            .withColumn("d2", _sqdist("sv", "cvec"))
            .withColumn(
                "rk",
                F.row_number().over(
                    W.partitionBy("id", "s").orderBy("d2", "code")
                ),
            )
            .filter(F.col("rk") == 1)
        )
        # integer-mean update; empty codes keep their previous centroid by
        # construction (no rows -> no update row -> left join below)
        updated = (
            assigned.select("s", "code", F.posexplode("sv").alias("p", "c"))
            .groupBy("s", "code", "p")
            .agg(F.expr("sum(c) div count(1)").alias("cm"))
            .groupBy("s", "code")
            .agg(F.array_sort(F.collect_list(F.struct("p", "cm"))).alias("o"))
            .select(
                "s", "code",
                F.transform("o", lambda x: x["cm"]).alias("cvec_new"),
            )
        )
        book = (
            book.join(updated, ["s", "code"], "left")
            .select(
                "s", "code",
                F.coalesce("cvec_new", "cvec").alias("cvec"),
            )
            .localCheckpoint(eager=False)
        )
    return book


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str, book: DataFrame, m: int = 8
) -> DataFrame:
    """(id, s, code) — m rows per vector, nearest codebook centroid per
    subspace (ties by code, deterministic)."""
    uv = _uvectors(_unit(df, vec_col), id_col, vec_col)
    dim = uv.select(F.size("uvec").alias("d")).limit(1).collect()[0]["d"]
    sv = _subvectors(uv, m, dim // m)
    return (
        sv.join(F.broadcast(book), "s")
        .withColumn("d2", _sqdist("sv", "cvec"))
        .withColumn(
            "rk",
            F.row_number().over(W.partitionBy("id", "s").orderBy("d2", "code")),
        )
        .filter(F.col("rk") == 1)
        .select("id", "s", "code")
    )


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str,
    vec_col: str,
    k_neighbors: int = 5,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    rerank: int = 20,
) -> DataFrame:
    """(id, rnk, sim) — top-k_neighbors by exact cosine among the `rerank`
    best ADC (PQ-approximate squared-L2) candidates. The corpus-heavy scan
    touches only (id, s, code) rows + the broadcast LUT; original vectors
    re-enter for the bounded rerank only."""
    spark = df.sparkSession
    book = pq_train(df, id_col, vec_col, m=m, k=k_codes, iters=iters)
    codes = pq_encode(df, id_col, vec_col, book, m=m)

    uv = _uvectors(df, id_col, vec_col)  # rerank: ORIGINAL vectors
    dim = uv.select(F.size("uvec").alias("d")).limit(1).collect()[0]["d"]
    q = spark.createDataFrame([(list(map(float, query_vec)),)], "qv array<float>")
    qu = _uvectors(_unit(q.select(F.lit(0).alias("qid"), "qv"), "qv"), "qid", "qv")
    qsub = _subvectors(qu, m, dim // m).select("s", F.col("sv").alias("qsv"))
    lut = (
        qsub.join(book, "s")
        .select("s", "code", _sqdist("qsv", "cvec").alias("pd2"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .groupBy("id")
        .agg(F.sum("pd2").alias("adc_d2"))
        .orderBy("adc_d2", "id")
        .limit(rerank)
    )
    qrow = _uvectors(q.select(F.lit(0).alias("qid"), "qv"), "qid", "qv").select(
        F.col("uvec").alias("quv"), F.col("n2").alias("qn2")
    )
    from .similarity import _dot

    rer = (
        uv.join(F.broadcast(adc.select("id")), "id")
        .withColumn("_j", F.lit(1))
        .join(F.broadcast(qrow.withColumn("_j", F.lit(1))), "_j")
        .drop("_j")
        .withColumn(
            "sim",
            _dot("uvec", "quv").cast("double")
            / F.sqrt(F.col("n2").cast("double") * F.col("qn2").cast("double")),
        )
    )
    w = W.orderBy(F.col("sim").desc(), F.col("id"))
    return (
        rer.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k_neighbors)
        .select("id", "rnk", "sim")
    )
