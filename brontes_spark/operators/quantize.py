"""Scalar (int8) embedding quantization + quantize-then-rerank ANN.

At 100 TB the embedding column IS the storage bill: 768 float32 dims are
3 KB/row. Per-dimension affine int8 codes cut that 4× (and the scan/
shuffle bytes with it) at ~1% cosine distortion — the standard
"SQ8" trick of FAISS/IVF systems, re-expressed relationally:

  * calibrate: one aggregate over exploded components → a dim-row
    (pos, mn, mx) table (a bounded summary dimension, the documented
    driver-side exception class);
  * encode: code = ((comp - mn) * 255) div (mx - mn)  ∈ [0, 255] — exact
    integer math on the repo's 6dp micro-unit grid, so codes (and every
    downstream result) are engine-identical and partitioning-invariant;
  * search: coarse top-C by reconstructed-vector cosine (in-row integer
    dot, same _dot machinery as the exact path), then EXACT rerank of the
    C candidates against the original micro-unit vectors — the usual
    recall knob: C = k is pure-quantized, C >> k approaches exact recall
    with the heavy scan still running over int8-reconstructions only.

The reconstruction v̂ = mn + code * (mx - mn) div 255 lives on the same
micro-unit long grid, so the coarse scan reuses the exact-integer dot; no
floats enter until the final ranking division (identical operands →
bit-identical across engines, the module-wide convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .similarity import _components, _dot, _uvectors


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, qvec array<int> ∈ [0,255], rvec array<long>, rn2 long) — the
    int8 codes, their micro-unit reconstruction, and the reconstruction's
    exact squared norm. Calibration is global per dimension (min/max over
    the corpus); constant dimensions (mx == mn) encode as 0 and
    reconstruct exactly to mn."""
    comp = _components(df, id_col, vec_col)
    rng = comp.groupBy("pos").agg(
        F.min("comp").alias("mn"), F.max("comp").alias("mx")
    )
    coded = (
        comp.join(F.broadcast(rng), "pos")
        .withColumn(
            "q",
            F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                F.expr("CAST(((comp - mn) * 255) div (mx - mn) AS INT)")
            ),
        )
        .withColumn(
            "r",
            F.when(F.col("mx") == F.col("mn"), F.col("mn")).otherwise(
                F.expr("mn + (q * (mx - mn)) div 255")
            ),
        )
    )
    return (
        coded.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "q", "r"))).alias("s"))
        .select(
            "id",
            F.transform("s", lambda s: s["q"]).alias("qvec"),
            F.transform("s", lambda s: s["r"]).alias("rvec"),
        )
        .withColumn(
            "rn2",
            F.aggregate(
                "rvec", F.lit(0).cast("long"), lambda acc, x: acc + x * x
            ),
        )
        .filter(F.col("rn2") > 0)  # same zero-norm guard as _uvectors
    )


def ann_quantized_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_pred,
    k: int = 5,
    rerank: int | None = None,
) -> DataFrame:
    """(query_id, rnk, neighbor_id, sim) — exact-reranked quantized search.
    The corpus-wide scan computes cosine on int8 RECONSTRUCTIONS (the 4×
    cheaper representation); the top `rerank` (default 4k) candidates per
    query are re-scored with the exact micro-unit dot and the final top-k
    comes from those. rerank >= corpus size degenerates to exact search."""
    if rerank is None:
        rerank = 4 * k
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    qz = quantize_int8(df, id_col, vec_col)
    uv = _uvectors(df, id_col, vec_col)
    qside = (
        qz.join(uv, "id")
        .join(df.filter(query_pred).select(F.col(id_col).alias("id")), "id")
        .select(
            F.col("id").alias("qid"),
            F.col("rvec").alias("q_rvec"),
            F.col("rn2").alias("q_rn2"),
            F.col("uvec").alias("q_uvec"),
            F.col("n2").alias("q_n2"),
        )
    )
    coarse = (
        qz.join(F.broadcast(qside), F.col("id") != F.col("qid"))
        .withColumn(
            "csim",
            _dot("q_rvec", "rvec").cast("double")
            / F.sqrt(F.col("q_rn2").cast("double") * F.col("rn2").cast("double")),
        )
    )
    wq = W.partitionBy("qid").orderBy(F.col("csim").desc(), F.col("id").asc())
    cands = coarse.withColumn("crnk", F.row_number().over(wq)).filter(
        F.col("crnk") <= rerank
    )
    exact = (
        cands.join(uv, "id")
        .withColumn(
            "sim",
            _dot("q_uvec", "uvec").cast("double")
            / F.sqrt(F.col("q_n2").cast("double") * F.col("n2").cast("double")),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("id").asc())
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rnk",
            F.col("id").alias("neighbor_id"),
            "sim",
        )
    )
