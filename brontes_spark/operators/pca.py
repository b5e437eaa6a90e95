"""Distributed PCA / whitening over an embedding column — the projection
step training-data pipelines run before ANN indexing and semantic dedup
(decorrelate, drop tail dimensions, equalize variance).

The 100 TB shape is the textbook two-phase split:

  1. `gram_matrix` — ONE distributed aggregate produces the d x d Gram
     matrix plus per-dimension sums; everything that touches the corpus is
     a map-side-combined groupBy whose shuffle is bounded by d^2 rows per
     task (d = 64 here), independent of corpus size. Embeddings are
     QUANTIZED to integers (floor(x * scale)) first, so the Gram entries
     are exact integer sums — partition-order independent, engine-exact,
     and therefore gate-checkable against a DuckDB oracle (float dot
     products would differ by summation order).
  2. `pca_fit` / `pca_project` — the d x d eigenproblem is solved on the
     DRIVER with numpy (the collect is bounded by d^2 rows, never by
     data — the same documented driver-side-dim pattern as
     pricing/graph.py), and the k eigenvectors broadcast back as literal
     arrays for a pure-codegen projection (one F.aggregate dot product
     per output dimension, no UDF, no shuffle).

Whitening divides each projected coordinate by sqrt(eigenvalue); output
floats are pytest-pinned against numpy's PCA on the collected matrix (the
float path is never oracle-hashed, per the repo's float-ln convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_vec(vec_col: str, scale: int = 1_000_000):
    """floor(x * scale) per component as an array<long> — truncation
    toward -inf, identical in Spark and DuckDB (round() half-way rules are
    NOT engine-identical on dyadic doubles; floor is)."""
    return F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * scale).cast("long")
    )


def gram_matrix(
    df: DataFrame, vec_col: str, scale: int = 1_000_000
) -> DataFrame:
    """(i, j, g, s_i, n) for the upper triangle i <= j: g = sum over rows
    of q_i * q_j (exact integers over the quantized embeddings), s_i = sum
    of q_i (for the mean correction), n = row count. d^2 output rows; the
    explode inflates in-flight only and partial-aggregates map-side."""
    q = df.select(quantize_vec(vec_col, scale).alias("q"))
    qi = q.select("q", F.posexplode("q").alias("i", "qi"))
    pairs = qi.select(
        "i", "qi", F.posexplode("q").alias("j", "qj")
    ).filter(F.col("j") >= F.col("i"))
    return pairs.groupBy("i", "j").agg(
        F.sum(F.col("qi") * F.col("qj")).alias("g"),
        F.sum("qi").alias("s_i"),
        F.count(F.lit(1)).alias("n"),
    )


def pca_fit(
    df: DataFrame, vec_col: str, k: int, scale: int = 1_000_000
):
    """(components, eigenvalues, mean): the top-k principal axes of the
    embedding column, solved on the driver from the d x d Gram collect
    (bounded by d^2 rows, never data). Components are rows of a (k, d)
    numpy array, eigenvalues descending, mean the per-dimension average of
    the quantized-and-rescaled vectors."""
    import numpy as np

    rows = gram_matrix(df, vec_col, scale).collect()
    d = max(r.j for r in rows) + 1
    n = rows[0].n
    g = np.zeros((d, d))
    s = np.zeros(d)
    for r in rows:
        g[r.i, r.j] = g[r.j, r.i] = r.g
        if r.i == r.j:
            s[r.i] = r.s_i
    mean = s / (n * scale)
    cov = g / (n * scale * scale) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    return evecs[:, order].T.copy(), evals[order].copy(), mean


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    scale: int = 1_000_000,
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """(id, proj array<double>): each embedding centered and projected onto
    the top-k principal axes (optionally whitened). The axes ship as
    literal arrays — the projection is k codegen dot products via
    F.aggregate, no UDF, no shuffle beyond the fit's bounded collect."""
    import numpy as np

    comps, evals, mean = pca_fit(df, vec_col, k, scale)
    if whiten:
        comps = comps / np.sqrt(np.maximum(evals, eps))[:, None]
    mean_lit = F.array(*[F.lit(float(x)) for x in mean])
    dots = []
    for r in range(comps.shape[0]):
        axis = F.array(*[F.lit(float(x)) for x in comps[r]])
        dots.append(
            F.aggregate(
                F.zip_with(
                    F.zip_with(
                        F.col(vec_col).cast("array<double>"),
                        mean_lit,
                        lambda x, m: x - m,
                    ),
                    axis,
                    lambda c, a: c * a,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return df.select(F.col(id_col), F.array(*dots).alias("proj"))


def pca_outliers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    threshold: float | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """(id, m2, is_outlier) — squared Mahalanobis distance of each
    embedding within the top-k principal subspace (the whitened
    projection's squared norm: whitening divides each axis by sqrt(its
    eigenvalue), so ||proj_w||^2 IS the Mahalanobis form) — the embedding
    anomaly screen corpus pipelines run before ANN indexing (mis-encoded
    rows, collapsed embeddings, wrong-model contamination all land in the
    tail). `threshold` defaults to 3x the subspace dimension — E[m2] = k
    for in-distribution points, so 3k is the z~sqrt(3)-sigma-ish budget
    flag; callers with a calibrated chi-square budget pass their own.
    Same bounded driver-side eigensolve as pca_project; the screen itself
    is one codegen projection."""
    if threshold is None:
        threshold = 3.0 * k
    proj = pca_project(df, id_col, vec_col, k, scale=scale, whiten=True)
    m2 = F.aggregate(
        F.col("proj"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return proj.select(
        F.col(id_col),
        m2.alias("m2"),
        (m2 > F.lit(float(threshold))).alias("is_outlier"),
    )
