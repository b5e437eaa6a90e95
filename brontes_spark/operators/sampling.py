"""Deterministic weighted sampling without replacement.

Efraimidis & Spirakis 2006 (A-ES): drawing m items with probabilities
proportional to weights, without replacement, equals ranking items by
u_i^(1/w_i) (u_i uniform) and keeping the top m. Floating pow is not
engine-portable, so this uses the integer-exact equivalent: the maximum of
w_i independent uniform hashes has CDF t^w_i — the SAME distribution as
u^(1/w_i) — and 60-bit md5 draws are pure functions of (salt, id, i). The
ranking, and therefore the sample, is deterministic, engine-identical, and
partitioning-invariant; changing `salt` redraws the whole sample.

Cost shape: materializing w hash draws per item costs sum(w) exploded rows
map-side, folded by a max-aggregate before the only shuffle (map-side
combine reduces each item to ONE (id, key) row per task). For token-count
weights this is ~the tokenization pass; `weight_scale` divides weights
down (ceil) when sum(w) is the concern — scaling all weights preserves
RELATIVE proportions approximately (exactly when all weights are
multiples of the scale). Top-m is TakeOrdered (per-partition heads + one
driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def weighted_sample_keys(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    salt: str = "ws",
    weight_scale: int = 1,
) -> DataFrame:
    """(id, key) — each item's A-ES ranking key: max of ceil(w/scale)
    uniform 60-bit draws. Items with (scaled) weight < 1 draw nothing and
    are dropped (weight 0 = never sampled, matching p ∝ w)."""
    if weight_scale < 1:
        raise ValueError(f"weight_scale must be >= 1, got {weight_scale}")
    w_eff = F.expr(
        f"CAST((CAST({weight_col} AS BIGINT) + {weight_scale - 1}) "
        f"div {weight_scale} AS BIGINT)"
    )
    # filter BEFORE sequence: Spark's sequence(1, 0) is the DESCENDING
    # [1, 0], not empty, so non-positive weights must never reach it
    reps = (
        df.select(F.col(id_col).alias("id"), w_eff.alias("_w"))
        .filter(F.col("_w") >= 1)
        .select(
            "id",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_w"))).alias("rep"),
        )
    )
    key = md5_long(
        F.concat(F.col("id").cast("string"), F.lit(":"), F.col("rep").cast("string")),
        seed=salt,
    )
    return reps.select("id", key.alias("key")).groupBy("id").agg(
        F.max("key").alias("key")
    )


def sample_weighted(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    m: int,
    salt: str = "ws",
    weight_scale: int = 1,
) -> DataFrame:
    """The m sampled ids with their ranking keys: (id, key), weighted
    without replacement. Deterministic tie-break (key DESC, id ASC) —
    60-bit keys collide with ~2^-60 odds, but the order is total either
    way, so both engines agree bit-for-bit."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    keys = weighted_sample_keys(df, id_col, weight_col, salt, weight_scale)
    return keys.orderBy(F.col("key").desc(), F.col("id")).limit(m)


def stratified_sample_exact_n(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "strat",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, deterministically.

    The data-mixing primitive: equal-size (or capped) draws per language /
    source / domain. Rank = md5 of (salt, stratum, id) so the draw is a
    pure function of identity — re-running, re-partitioning, or growing
    OTHER strata never changes a stratum's sample (each stratum's ordering
    depends only on its own members), and `salt` redraws everything.

    Scale shape: rank <= n over (stratum ORDER BY hash) compiles to
    WindowGroupLimit — every task keeps at most n rows per stratum BEFORE
    the shuffle, so the exchange carries O(n_strata * n) rows no matter the
    corpus size. No global sort, no count pass.
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    from pyspark.sql import Window as W

    tag = md5_long(
        F.concat(
            F.col(strata_col).cast("string"),
            F.lit(":"),
            F.col(id_col).cast("string"),
        ),
        seed=salt,
    )
    w = W.partitionBy(strata_col).orderBy(tag, F.col(id_col))
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= n_per_stratum)
    )


def balanced_weighted_sample(
    df: DataFrame,
    class_col: str,
    id_col: str,
    weight_col: str,
    n_per_class: int,
    salt: str = "bal",
    weight_scale: int = 1,
) -> DataFrame:
    """Per-class balanced subset, weighted WITHIN each class: exactly
    min(n, |{class members with scaled weight >= 1}|) rows per class,
    drawn without replacement with probability proportional to weight —
    the A-ES machinery of ``weighted_sample_keys`` generalized to one
    independent draw per stratum (VERDICT r10 directive 7b). The
    training-data use: class-balanced eval/finetune subsets where the
    within-class draw should still prefer high-quality documents
    (weight = quality score / token count / dedup-cluster size).

    Determinism: the ranking key is max of ceil(w/scale) md5 draws over
    (salt, class, id, i) — a pure function of identity, so
    re-partitioning, re-running, or growing OTHER classes never changes
    a class's sample, and ``salt`` redraws everything. Items with
    scaled weight < 1 are never sampled (p ∝ w).

    Scale shape: the sum(w)/scale exploded draw rows fold map-side
    (partial max per (class, id) before the only data-sized shuffle);
    the per-class top-n is rank <= n over (class ORDER BY key DESC, id)
    which compiles to WindowGroupLimit — each task ships at most n rows
    per class into the final exchange, so it carries
    O(n_classes * n) rows no matter the corpus size. Output: (class,
    id, key, rk) with rk 1..n in draw order (a prefix of the sample is
    itself a valid smaller sample — the A-ES nesting property)."""
    if n_per_class < 1:
        raise ValueError(f"n_per_class must be >= 1, got {n_per_class}")
    if weight_scale < 1:
        raise ValueError(f"weight_scale must be >= 1, got {weight_scale}")
    from pyspark.sql import Window as W

    w_eff = F.expr(
        f"CAST((CAST({weight_col} AS BIGINT) + {weight_scale - 1}) "
        f"div {weight_scale} AS BIGINT)"
    )
    # filter BEFORE sequence (the weighted_sample_keys rule: Spark's
    # sequence(1, 0) is the DESCENDING [1, 0], not empty)
    reps = (
        df.select(
            F.col(class_col).alias("cls"),
            F.col(id_col).alias("id"),
            w_eff.alias("_w"),
        )
        .filter(F.col("_w") >= 1)
        .select(
            "cls",
            "id",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_w"))).alias("rep"),
        )
    )
    key = md5_long(
        F.concat(
            F.col("cls").cast("string"),
            F.lit(":"),
            F.col("id").cast("string"),
            F.lit(":"),
            F.col("rep").cast("string"),
        ),
        seed=salt,
    )
    keys = reps.select("cls", "id", key.alias("key")).groupBy("cls", "id").agg(
        F.max("key").alias("key")
    )
    w = W.partitionBy("cls").orderBy(F.col("key").desc(), F.col("id"))
    return (
        keys.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= n_per_class)
    )


# NOTE: the FRACTION-based stratified sampler already exists as
# operators/dedup.sample_stratified (per-stratum md5-threshold keep rates,
# zero shuffle; gated as `sample_stratified` in plans/llm_data.py).
# stratified_sample_exact_n above is its exact-count complement: fixed n
# per stratum rather than a keep probability; balanced_weighted_sample is
# the weighted-within-stratum generalization of both.
