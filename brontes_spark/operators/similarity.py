"""Similarity search over embedding columns (array<float>).

  * cosine_topk — brute-force exact top-k: the correctness baseline. The dot
    products and norms run in exact integer arithmetic so ranking is
    engine-deterministic (sum order never matters).
  * lsh_buckets — random-hyperplane LSH bucketing: the 100 TB path. Each
    vector maps to a small integer bucket via sign projections on
    md5-seeded ±1 hyperplanes; ANN then probes only same-bucket candidates —
    an equality join on bucket id instead of an n² cross join.

All pure DataFrame plans, no UDFs. Two vector representations, chosen per
operator by measurement: exploded (id, pos, comp) rows (``_components``)
feed the codegen'd join+groupBy sign projections of lsh_buckets, while
un-exploded micro-unit long arrays (``_uvectors``) feed cosine_topk/ivf_topk,
whose dot products run as in-row zip_with+aggregate folds so pair streams
stay one row per pair (never ×dim). At scale the dominant cost is the
candidate-pair shuffle, which LSH/IVF candidate blocking bounds.

Arithmetic: components quantize to 6dp micro-units held in BIGINT (the
unscaled value of the decimal(9,6) representation the oracle uses). Products
stay below 2^42 and 64-dim sums below 2^53, so every intermediate is exact,
every sum is order-independent, AND the whole pipeline runs on primitive
longs instead of boxed decimals — measured ~3-5× faster on the dot-product
stages. The final similarity divides two exact-double conversions
(numerator < 2^53, norm products multiplied as doubles) so both engines emit
the identical float, micro-unit scales cancelling in the ratio.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType, StructField, StructType

from ..functions.decimals import dec9
from ..functions.hashing import md5_bit, md5_long


def _components(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, pos, comp bigint) — exploded exact 6dp micro-unit components.

    The decimal(9,6) cast performs the engine-agnostic rounding (see dec9);
    scaling by 10^6 and casting to long is then exact."""
    return (
        df.select(
            F.col(id_col).alias("id"), F.posexplode(F.col(vec_col)).alias("pos", "c")
        )
        .withColumn("comp", (dec9(F.col("c")) * F.lit(1000000)).cast("long"))
        .drop("c")
    )


def _uvectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, uvec array<long>, n2 bigint) — each vector quantized
    element-wise to 6dp micro-unit longs (dec9 performs the engine-agnostic
    rounding, so values are identical to the oracle's exploded `comp` CTE)
    plus its exact squared norm, computed in-row with array HOFs.
    Zero-length/null vectors are dropped, matching the exploded form where
    they produce no component rows.
    """
    u = F.transform(
        F.col(vec_col), lambda c: (dec9(c) * F.lit(1000000)).cast("long")
    )
    return (
        df.filter(F.size(F.col(vec_col)) > 0)
        .select(F.col(id_col).alias("id"), u.alias("uvec"))
        .withColumn(
            "n2",
            F.aggregate(
                "uvec", F.lit(0).cast("long"), lambda acc, x: acc + x * x
            ),
        )
        # zero-NORM vectors (all components quantize to 0) must also drop:
        # their cosine is 0/0 = NaN, which Spark ranks ABOVE every real
        # similarity (NaN sorts last-desc-first) and which passes >=
        # threshold filters — a zero embedding would become everyone's top
        # neighbor and a universal "near-duplicate". The oracle twins apply
        # the same n2 > 0 guard in their norms CTEs.
        .filter(F.col("n2") > 0)
    )


def _dot(a: Column | str, b: Column | str) -> Column:
    """Exact integer dot product of two micro-unit long arrays (in-row;
    components < 2^21, 64-dim sums < 2^53 — never overflows, and the
    sequential fold makes the sum order-independent by construction)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_pred: Column,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbours for rows matching ``query_pred``.

    Returns (query_id, rnk, neighbor_id, sim); ties broken by neighbor id.

    Plan shape: the query side (assumed small — it's the probe set) is
    broadcast against the candidate vectors and every dot product runs
    in-row over the two long arrays (zip_with + aggregate). The pair stream
    is Q×N rows — a factor `dim` fewer than the exploded join+groupBy
    formulation — and needs NO shuffle at all before the final per-query
    top-k window (Q×k-bounded via rank pushdown). The candidate side is
    hash-repartitioned first only so a single-file local scan can't serialize
    the CPU-bound multiply stage; at cluster scale the scan is already wide.
    """
    uv = _uvectors(df, id_col, vec_col)
    qv = _uvectors(df.filter(query_pred), id_col, vec_col).select(
        F.col("id").alias("qid"), F.col("uvec").alias("quvec"), F.col("n2").alias("qn2")
    )
    cand = uv.repartition(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")), F.col("id")
    )
    out = (
        cand.join(F.broadcast(qv), F.col("id") != F.col("qid"))
        .withColumn(
            "sim",
            # no rounding: dot/norms are exact integers, so this double is
            # already bit-identical across engines (identical operands)
            _dot("quvec", "uvec").cast("double")
            / F.sqrt(F.col("qn2").cast("double") * F.col("n2").cast("double")),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("id").asc())
    return (
        out.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rnk",
            F.col("id").alias("neighbor_id"),
            "sim",
        )
    )


def planes_for(n_vectors: int, target_occupancy: int = 32) -> int:
    """Size the hyperplane count from the corpus cardinality: planes =
    ceil(log2(n / target_occupancy)), floored at 4.

    This is the LSH scale dial measured in SCALE.md's 10x slope experiment:
    with a FIXED plane count, expected bucket occupancy — and therefore the
    candidate-pair stream of the bucket-blocked paths (cosine_dup_pairs) —
    grows linearly with the corpus, making pair generation quadratic
    overall. Holding occupancy constant by growing planes with log2(N)
    restores a ~linear cost. `n_vectors` is typically a known table size or
    a cheap `df.count()` at index-build time; at 100 TB the count is free
    from table metadata.
    """
    import math

    return max(4, math.ceil(math.log2(max(n_vectors, 1) / target_occupancy)))


def lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: int = 8,
    comp: DataFrame | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = bits of sign(v · h_j), j < planes.

    Hyperplane component h_j[d] ∈ {+1, -1} derives from md5(j || '-' || d) —
    reproducible in any engine. Projections are exact integer sums, so the
    sign (and therefore the bucket) is deterministic.

    The sign table depends only on (plane, pos) — `planes·dim` values — so
    it materializes once as a broadcast dim and every projection folds into
    ONE per-id aggregation (no per-row md5, no planes× row explosion; at
    100 TB the only wide op is the single groupBy(id)). Pass a precomputed
    `comp` to share the exploded components with sibling pipeline stages.
    """
    if comp is None:
        comp = _components(df, id_col, vec_col)
    if dim is None:
        # one-row peek, not a corpus statistic: vectors are fixed-width, so
        # any non-empty row carries the dimensionality (limit-1 scan with a
        # pushed filter, no shuffle). Null/empty vectors are skipped — a
        # null sample would yield size() = -1 and an empty sign table that
        # silently dropped every bucket. An all-empty corpus leaves comp
        # empty, so any positive dim produces the correct empty result.
        rows = (
            df.filter(F.size(F.col(vec_col)) > 0)
            .select(F.size(F.col(vec_col)).alias("d"))
            .limit(1)
            .collect()
        )
        dim = rows[0]["d"] if rows else 1
    sign_cols = [
        F.when(
            md5_bit(
                F.concat(F.lit(str(j)), F.lit("-"), F.col("pos").cast("string"))
            )
            == 1,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias(f"s{j}")
        for j in range(planes)
    ]
    # positions 0..dim-1 are known statically — derive the planes×dim sign
    # table from spark.range, NOT from the corpus (a distinct() over the
    # exploded components would scan+shuffle the full table to enumerate
    # integers we already know; at 100 TB that is a full-corpus exchange for
    # a 64-row dim)
    spark = df.sparkSession
    signs = F.broadcast(
        spark.range(dim).select(F.col("id").cast("int").alias("pos"), *sign_cols)
    )
    proj = (
        comp.join(signs, "pos")
        .groupBy("id")
        .agg(
            *[
                F.sum(F.col("comp") * F.col(f"s{j}")).alias(f"p{j}")
                for j in range(planes)
            ]
        )
    )
    bucket = None
    for j in range(planes):
        bit = F.when(F.col(f"p{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bit if bucket is None else bucket + bit
    return proj.select("id", bucket.alias("bucket"))


def _seeded_centroids(uv: DataFrame, k_clusters: int) -> DataFrame:
    """Broadcast (cid_seed, cuvec, cn2) centroid dim: the first k_clusters
    vectors ranked by md5(id) — a deterministic pseudo-random sample with
    an exact SQL twin (no Lloyd iterations). TakeOrderedAndProject keeps
    the seed selection a per-partition partial top-K even at billions of
    ids."""
    seeds = (
        uv.select("id")
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(k_clusters)
        .select(F.col("id").alias("cid_seed"))
    )
    return F.broadcast(
        uv.join(F.broadcast(seeds), uv["id"] == seeds["cid_seed"]).select(
            "cid_seed", F.col("uvec").alias("cuvec"), F.col("n2").alias("cn2")
        )
    )


def _centroid_sims(side: DataFrame, cents: DataFrame) -> DataFrame:
    """(.., cid_seed, sim) — broadcast NLJ of `side` against the K-row
    centroid dim with the exact in-row dot; K rows per input row."""
    return side.join(cents).withColumn(
        "sim",
        _dot("uvec", "cuvec").cast("double")
        / F.sqrt(F.col("n2").cast("double") * F.col("cn2").cast("double")),
    )


#: geometry dispatch for the flat assignment paths: below this K the
#: NumPy kernels' fixed costs (two bounded driver collects = two extra
#: jobs, plus the Arrow pass) exceed the matmul win — measured at sf0.1:
#: k=8 gates ran ~0.6-0.9 s FASTER on the relational NLJ+window plan,
#: while k=320 runs ~2x faster on the kernels. Both paths are
#: bit-identical (same sims, same tie-breaks; the pytest anchors and
#: oracle gates pin it), so the dispatch is purely a cost choice.
_NP_KERNEL_MIN_K = 64


def _flat_top1_relational(side: DataFrame, cents: DataFrame) -> DataFrame:
    """(id, cluster) via the broadcast-NLJ + row_number plan — the
    small-K arm of the dispatch (kernel block below for the large-K arm).
    The repartition spreads the CPU-bound in-row dot stage when the input
    is a single local scan partition; at scale the scan is already wide."""
    n_part = int(side.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        _centroid_sims(side.repartition(n_part, F.col("id")), cents)
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("id").orderBy(
                    F.col("sim").desc(), F.col("cid_seed").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("id", F.col("cid_seed").alias("cluster"))
    )


def _refined_centroids(uv: DataFrame, asg: DataFrame) -> DataFrame:
    """One Lloyd update in exact integer arithmetic: the new centroid of a
    cluster is the element-wise TRUNCATED mean of its members' micro-unit
    components (`div` — both engines truncate toward zero, so the
    re-quantization is engine-identical). The mean lands back on the same
    6dp micro-unit grid as the vectors themselves (|mean| <= max |comp|),
    so the follow-up assignment reuses _centroid_sims with the same
    overflow bounds as the seeded pass — the whole iteration stays a
    closed-form relational plan with an exact SQL twin. Clusters that lose
    all members (or whose mean truncates to the zero vector) simply emit
    no centroid row, mirrored by the oracle's HAVING guard."""
    members = asg.join(uv, "id").select(
        "cluster", "id", F.posexplode("uvec").alias("pos", "comp")
    )
    sums = members.groupBy("cluster", "pos").agg(
        F.sum("comp").alias("s"), F.count(F.lit(1)).alias("n")
    )
    per_pos = sums.select(
        "cluster", "pos", F.expr("CAST(s div n AS BIGINT)").alias("ccomp")
    )
    cents = (
        per_pos.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "ccomp"))),
                lambda x: x["ccomp"],
            ).alias("cuvec")
        )
        .withColumn(
            "cn2",
            F.aggregate("cuvec", F.lit(0).cast("long"), lambda a, x: a + x * x),
        )
        .filter(F.col("cn2") > 0)
        .select(F.col("cluster").alias("cid_seed"), "cuvec", "cn2")
    )
    return F.broadcast(cents)


# ---------------------------------------------------------------------------
# NumPy/Arrow kernels (round-11 optimization pass, guide §4.2).
#
# The centroid-assignment passes used to run as a BroadcastNestedLoopJoin of
# N vectors × K centroid rows, each output row evaluating the in-row
# `_dot` fold (aggregate ∘ zip_with — higher-order expressions, which Spark
# evaluates interpreted, outside whole-stage codegen), followed by a
# row_number window over the N×K pair stream to keep the top-1. Measured at
# the k=320 bench geometry (20k vectors × 320 centroids × 64 dims) the
# interpreted fold + the 6.4M-row sort/window dominated the operator wall.
# The kernels below compute the SAME quantities batch-at-a-time in NumPy
# float64 BLAS matmuls behind mapInPandas/applyInPandas: the JVM↔Python boundary
# crosses once per pass carrying only (id, uvec, n2), and the N×K pair
# stream, its sort, and the window disappear from the plan entirely.
#
# Exactness contract (bit-identical to the expression path, which the
# oracle-pinned gates verify):
#   * dots and norms are exact integers (|comp| < 2^21, so every product
#     is < 2^42 and every 64-dim partial sum < 2^53 — the module-head
#     envelope). The matmuls run in float64 BLAS: every term and partial
#     sum is an integer below 2^53, hence exactly representable, so dgemm
#     returns the exact integer dot regardless of summation order (numpy
#     int64 matmul has no BLAS kernel and runs ~50x slower interpreted —
#     measured 12 s vs 0.3 s for the 20k x 320 x 64 assignment batch);
#   * sim = float64(dot) / sqrt(float64(n2) * float64(cn2)) — the identical
#     IEEE op sequence Spark's `_centroid_sims` emits, so both produce the
#     same double bit-for-bit;
#   * argmax ties resolve to the smallest centroid id: the centroid matrix
#     is sorted by cid ascending and np.argmax returns the FIRST maximum —
#     exactly row_number() over (sim desc, cid_seed asc) = 1.
# ---------------------------------------------------------------------------


def _centroid_mats(cents: DataFrame):
    """Collect the K-row centroid dim (cid_seed, cuvec, cn2) to the driver —
    K rows, the same bounded scalar-dim class as the existing k-centroid
    collects (never data-sized) — and return (cids, C, cn2) numpy arrays
    sorted by cid ascending (the argmax tie-break order)."""
    import numpy as np

    rows = sorted(cents.collect(), key=lambda r: r["cid_seed"])
    cids = np.array([r["cid_seed"] for r in rows], dtype=np.int64)
    # float64 carriers: exact for the < 2^53 envelope, and they keep every
    # downstream matmul on the BLAS dgemm path (kernel-block note above)
    C = np.array([list(r["cuvec"]) for r in rows], dtype=np.float64)
    cn2 = np.array([r["cn2"] for r in rows], dtype=np.float64)
    return cids, C, cn2


def _sims_f64(dots, n2, cn2):
    """float64 cosine matrix from exact (float64-carried) dots/norms — the
    identical IEEE sequence as `_centroid_sims` (the operands are exact
    integers, so convert-then-divide and divide-the-float64-carrier are
    the same bits)."""
    import numpy as np

    return dots / np.sqrt(n2[:, None] * cn2[None, :])


def _np_top1_assign(side: DataFrame, cents: DataFrame) -> DataFrame:
    """(id, cluster): flat max-cosine assignment as ONE Arrow pass over
    `side` (id, uvec, n2) with the K×dim centroid matrix broadcast.
    Replaces the NLJ + row_number formulation plan-for-plan: no pair
    stream, no sort, no window, no shuffle — parallelism is the input
    partitioning (the scan is wide at scale; a 20k-row local run is a
    single fast matmul task)."""
    spark = side.sparkSession
    b = spark.sparkContext.broadcast(_centroid_mats(cents))
    id_type = side.schema["id"].dataType
    schema = StructType(
        [StructField("id", id_type), StructField("cluster", id_type)]
    )

    def assign(batches):
        import numpy as np
        import pandas as pd

        cids, C, cn2 = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            U = np.array(list(pdf["uvec"]), dtype=np.float64)
            n2 = pdf["n2"].to_numpy(np.float64)
            sims = _sims_f64(U @ C.T, n2, cn2)
            j = np.argmax(sims, axis=1)  # first max = smallest cid
            yield pd.DataFrame({"id": pdf["id"], "cluster": cids[j]})

    return side.select("id", "uvec", "n2").mapInPandas(assign, schema)


def _np_topn_rows(side: DataFrame, cents: DataFrame, n_keep: int) -> DataFrame:
    """(id, cluster) rows for each of the `n_keep` nearest centroids per
    side row — the probe counterpart of `_np_top1_assign` (row_number <=
    n over (sim desc, cid asc), emitted as rows). Stable argsort over
    (-sim) with the centroid matrix in cid-ascending order reproduces the
    window's tie-break exactly."""
    spark = side.sparkSession
    b = spark.sparkContext.broadcast(_centroid_mats(cents))
    id_type = side.schema["id"].dataType
    schema = StructType(
        [StructField("id", id_type), StructField("cluster", id_type)]
    )

    def probe(batches):
        import numpy as np
        import pandas as pd

        cids, C, cn2 = b.value
        k = min(n_keep, len(cids))
        for pdf in batches:
            if not len(pdf):
                continue
            U = np.array(list(pdf["uvec"]), dtype=np.float64)
            n2 = pdf["n2"].to_numpy(np.float64)
            sims = _sims_f64(U @ C.T, n2, cn2)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :k]
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), k),
                    "cluster": cids[order].ravel(),
                }
            )

    return side.select("id", "uvec", "n2").mapInPandas(probe, schema)


def _np_two_level_assign(
    side: DataFrame,
    cents: DataFrame,
    nprobe_super: int,
    branch: int,
) -> DataFrame:
    """Two-level probe (the `_two_level_top1` semantics) as ONE Arrow pass:
    route each centroid to its top-1 super (md5-seeded FROM the centroid
    set, exactly as the relational path), probe each vector's
    `nprobe_super` nearest supers, and argmax only over the probed supers'
    member centroids. Super routing and membership are computed ONCE on
    the driver over the bounded K-row centroid dim; per batch the kernel
    does an N×branch probe matmul plus an N×K masked matmul — the same
    candidate set, sims, and (sim desc, cid asc) tie-break as the
    relational plan, so nprobe_super >= branch stays bit-equal to flat
    (the pytest anchor)."""
    import hashlib

    import numpy as np

    spark = side.sparkSession
    # ONE bounded collect: centroid matrices, super seeding AND routing all
    # derive from the same K rows. (An earlier draft re-collected the
    # super dim through _seeded_centroids, which re-executed the centroid
    # plan — for kmeans_refine's REFINED centroids that meant running the
    # whole assignment + Lloyd chain twice per round.) The super sample is
    # the SAME md5-ordered pseudo-random pick _seeded_centroids takes:
    # hashlib.md5(str(id)) equals Spark md5(cast(id as string)) for the
    # long/string ids this operator sees, and the (md5, id) sort is the
    # identical total order.
    rows = sorted(cents.collect(), key=lambda r: r["cid_seed"])
    if not rows:
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("id", side.schema["id"].dataType),
                    StructField("cluster", side.schema["id"].dataType),
                ]
            ),
        )
    cids = np.array([r["cid_seed"] for r in rows], dtype=np.int64)
    C = np.array([list(r["cuvec"]) for r in rows], dtype=np.float64)
    cn2 = np.array([r["cn2"] for r in rows], dtype=np.float64)
    seed_order = sorted(
        range(len(rows)),
        key=lambda i: (
            hashlib.md5(str(rows[i]["cid_seed"]).encode()).hexdigest(),
            rows[i]["cid_seed"],
        ),
    )
    # supers sorted by super_id ascending — the argmax/argsort tie-break
    sup_idx = sorted(seed_order[: min(branch, len(rows))])
    S, sn2 = C[sup_idx], cn2[sup_idx]
    sup_ids = cids[sup_idx]
    # centroid -> super routing: top-1 by (ssim desc, super_id asc); S is
    # sorted by super_id so argmax's first-max IS the tie-break
    route = np.argmax(_sims_f64(C @ S.T, cn2, sn2), axis=1)
    b = spark.sparkContext.broadcast((cids, C, cn2, S, sn2, route))
    id_type = side.schema["id"].dataType
    schema = StructType(
        [StructField("id", id_type), StructField("cluster", id_type)]
    )
    p = min(nprobe_super, len(sup_ids))

    def assign(batches):
        import numpy as np
        import pandas as pd

        cids, C, cn2, S, sn2, route = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            U = np.array(list(pdf["uvec"]), dtype=np.float64)
            n2 = pdf["n2"].to_numpy(np.float64)
            ssims = _sims_f64(U @ S.T, n2, sn2)
            # top-p supers by (ssim desc, super_id asc): stable sort keeps
            # index order (= super_id asc, S sorted) on ties
            probed = np.argsort(-ssims, axis=1, kind="stable")[:, :p]
            cand = (route[None, None, :] == probed[:, :, None]).any(axis=1)
            sims = _sims_f64(U @ C.T, n2, cn2)
            sims[~cand] = -np.inf
            j = np.argmax(sims, axis=1)
            ok = cand.any(axis=1)  # defensive: relational inner join drops
            yield pd.DataFrame(
                {"id": pdf["id"][ok], "cluster": cids[j[ok]]}
            )

    return side.select("id", "uvec", "n2").mapInPandas(assign, schema)


def _np_cluster_dedup(withvec: DataFrame, threshold: float) -> DataFrame:
    """(id, cluster, kept) from per-cluster near-duplicate matrices: one
    Arrow pass per cluster group (applyInPandas) computing the member×
    member exact-integer Gram matrix blockwise (float64 BLAS carrier) and flagging every id with a
    smaller-id mate at/above `threshold` — the same pairs, sims (identical
    IEEE sequence) and min-id survivor rule as the self-join + distinct
    formulation, with ONE shuffle of N compact rows instead of a shuffled
    ~sum(|cluster|²)/2 pair stream. Row blocks of 1024 bound the per-group
    working set to |cluster|×1024 doubles; |cluster| itself is bounded by
    the SemDeDup dial (k_clusters ~ N / target size, module docstring)."""
    id_type = withvec.schema["id"].dataType
    cl_type = withvec.schema["cluster"].dataType
    schema = StructType(
        [
            StructField("id", id_type),
            StructField("cluster", cl_type),
            StructField("kept", BooleanType()),
        ]
    )

    def dedup(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("id", kind="mergesort")
        m = len(pdf)
        U = np.array(list(pdf["uvec"]), dtype=np.float64)
        rn2 = pdf["n2"].to_numpy(np.float64)
        dropped = np.zeros(m, dtype=bool)
        cols = np.arange(m)
        for i0 in range(0, m, 1024):
            blk = U[i0 : i0 + 1024]
            sims = (blk @ U.T) / np.sqrt(
                rn2[i0 : i0 + 1024, None] * rn2[None, :]
            )
            ge = sims >= threshold
            rows = np.arange(i0, i0 + len(blk))[:, None]
            dropped |= (ge & (rows < cols[None, :])).any(axis=0)
        return pd.DataFrame(
            {"id": pdf["id"], "cluster": pdf["cluster"], "kept": ~dropped}
        )

    return (
        withvec.select("id", "cluster", "uvec", "n2")
        .groupBy("cluster")
        .applyInPandas(lambda _, pdf: dedup(pdf), schema)
    )


def _np_refined_centroids(uv: DataFrame, asg: DataFrame) -> DataFrame:
    """One Lloyd update (the `_refined_centroids` semantics) in TWO Arrow
    stages: a map-side partial-sum kernel over the (broadcast-joined)
    membership, then a per-cluster reduce over the bounded partials.

    Round-11 reshape (guide §2.3 / §5): the previous per-cluster
    `groupBy(cluster).applyInPandas` shuffled every member's uvec payload
    to its cluster's task and materialized the WHOLE cluster as one pandas
    frame — unbounded task memory when a cluster owns a corpus-sized
    member set. Now each input partition folds its members into exact
    int64 partial sums per cluster (integer addition is order-free, so
    partials recompose exactly), and the only shuffle carries
    <= |partitions| x K compact (cluster, psum, n) rows; the reduce group
    is bounded by the partition count, never by membership. Same outputs
    bit-for-bit: truncated-toward-zero mean sign·(|s| div n) over the
    TOTAL sums, exact cn2, empty/zero-mean clusters emit no row."""
    cl_type = asg.schema["cluster"].dataType
    pschema = StructType(
        [
            StructField("cluster", cl_type),
            StructField("psum", ArrayType(LongType())),
            StructField("n", LongType()),
        ]
    )
    schema = StructType(
        [
            StructField("cid_seed", cl_type),
            StructField("cuvec", ArrayType(LongType())),
            StructField("cn2", LongType()),
        ]
    )

    def partial(batches):
        import numpy as np
        import pandas as pd

        sums: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            U = np.array(list(pdf["uvec"]), dtype=np.int64)
            cl = pdf["cluster"].to_numpy()
            for c in pd.unique(cl):
                s = U[cl == c].sum(axis=0)
                if c in sums:
                    sums[c][0] += s
                    sums[c][1] += int((cl == c).sum())
                else:
                    sums[c] = [s, int((cl == c).sum())]
        if sums:
            yield pd.DataFrame(
                {
                    "cluster": list(sums),
                    "psum": [v[0].tolist() for v in sums.values()],
                    "n": [v[1] for v in sums.values()],
                }
            )

    def reduce_(key, pdf):
        import numpy as np
        import pandas as pd

        s = np.array(list(pdf["psum"]), dtype=np.int64).sum(axis=0)
        n = int(pdf["n"].sum())
        cc = np.sign(s) * (np.abs(s) // n)
        cn2 = int((cc * cc).sum())
        if cn2 <= 0:
            return pd.DataFrame({"cid_seed": [], "cuvec": [], "cn2": []})
        return pd.DataFrame(
            {"cid_seed": [key[0]], "cuvec": [cc.tolist()], "cn2": [cn2]}
        )

    # NO broadcast hint on asg: it is one row per VECTOR (corpus-sized at
    # scale) — the planner broadcasts it at gate geometry on its own, and
    # at scale both sides hash-partition on id (uv's cache layout), so the
    # uvec payload crosses the network at most once, here, and never again
    # (the cluster-keyed shuffle below carries only partials)
    members = uv.join(asg.select("id", "cluster"), "id").select(
        "cluster", "uvec"
    )
    partials = members.mapInPandas(partial, pschema)
    return F.broadcast(partials.groupBy("cluster").applyInPandas(reduce_, schema))


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_pred: Column,
    k: int = 5,
    k_clusters: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-bucketed ANN: the inverted-file variant of the scale path.

    Index: `k_clusters` centroids chosen as the vectors ranking first by
    md5(id) (deterministic pseudo-random sample; no Lloyd iterations, so
    the whole index is a closed-form relational plan — and an exact SQL
    oracle twin exists). Every vector is assigned to its max-cosine
    centroid (exact-decimal dots; ties to the smaller centroid id).

    Query: probe the `nprobe` nearest centroids, then exact cosine top-k
    over only the probed clusters' members — the candidate set shrinks by
    ~k_clusters/nprobe vs brute force, which is the IVF scaling story
    (recall trades off when a true neighbour lives outside probed cells).

    The K×dim centroid side is broadcast as quantized arrays, assignment /
    probe sims are in-row folds over N×K (resp. Q×K) pair rows, and the
    refinement dot is in-row over the pruned candidate pairs — the only wide
    shuffles left are the assignment top-1 window and the candidate-to-vector
    equi-joins, all on fixed-width keys.
    """
    # uv feeds assignment, probing, and the final dot pass — cache it (one
    # row per vector with a dim-length long array; spills to disk at scale,
    # 3 recomputed parquet scans + quantizations cost more).
    uv = _uvectors(df, id_col, vec_col).cache()

    # centroid seeding restricted to ids with non-empty vectors (uv already
    # filters those) so a null/empty vector can never seed a dead cluster —
    # the oracle seeds from DISTINCT comp ids, and uv's filter is the
    # explode-free equivalent.
    cents = _seeded_centroids(uv, k_clusters)

    # assignment + probes: geometry dispatch (_NP_KERNEL_MIN_K) between
    # the relational NLJ+window plan and the NumPy kernels — bit-identical
    # sims/tie-breaks either way
    use_np = k_clusters >= _NP_KERNEL_MIN_K
    asg = _np_top1_assign(uv, cents) if use_np else _flat_top1_relational(uv, cents)

    qids = df.filter(query_pred).select(F.col(id_col).alias("qid"))
    qv = uv.join(qids, uv["id"] == qids["qid"]).select("id", "uvec", "n2")
    if use_np:
        probes = _np_topn_rows(qv, cents, nprobe).select(
            F.col("id").alias("qid"), "cluster"
        )
    else:
        probes = (
            _centroid_sims(qv, cents)
            .withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("id").orderBy(
                        F.col("sim").desc(), F.col("cid_seed").asc()
                    )
                ),
            )
            .filter(F.col("rn") <= nprobe)
            .select(F.col("id").alias("qid"), F.col("cid_seed").alias("cluster"))
        )

    # candidate pairs from probed clusters only (the IVF pruning), then attach
    # both vectors: candidate side by equi-join on id, query side broadcast.
    cand = F.broadcast(probes).join(asg, "cluster").filter(
        F.col("id") != F.col("qid")
    ).select("qid", F.col("id").alias("cid"))
    qarr = F.broadcast(
        qv.select(
            F.col("id").alias("qid"), F.col("uvec").alias("quvec"), F.col("n2").alias("qn2")
        )
    )
    out = (
        cand.join(uv.withColumnRenamed("id", "cid"), "cid")
        .join(qarr, "qid")
        .withColumn(
            "sim",
            _dot("quvec", "uvec").cast("double")
            / F.sqrt(F.col("qn2").cast("double") * F.col("n2").cast("double")),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    return (
        out.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").alias("query_id"), "rnk", F.col("cid").alias("neighbor_id"), "sim"
        )
    )


def cosine_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-family member of
    the similarity stack): candidate pairs come from the LSH bucket
    equality join (same random-hyperplane buckets as lsh_buckets — near-
    identical vectors collide with high probability), then the exact
    decimal cosine keeps pairs at/above `threshold`.

    Recall caveat (documented, same as any LSH dedup): a true near-dup pair
    split across buckets is missed; raise `planes`' complement (fewer
    planes → bigger buckets → higher recall, more candidates) to trade
    cost for recall. At 100 TB the bucket join IS the plan — brute-force
    n² is not."""
    # comp feeds buckets, dots, and norms — cache (see ivf_topk note)
    comp = _components(df, id_col, vec_col).cache()
    # n2 > 0: a zero-quantizing pair would divide 0/0 below — a
    # DIVIDE_BY_ZERO crash under ANSI (NaN pair otherwise); the inner norm
    # joins then drop zero-norm ids before the division, matching the
    # oracle's HAVING guard
    norms = comp.groupBy("id").agg(
        F.sum(F.col("comp") * F.col("comp")).alias("n2")
    ).filter(F.col("n2") > 0)
    buckets = lsh_buckets(df, id_col, vec_col, planes=planes, comp=comp)
    a = buckets.select(F.col("id").alias("id_a"), "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "bucket")
    cand = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b"
    )
    ca = comp.select(F.col("id").alias("id_a"), "pos", F.col("comp").alias("c_a"))
    cb = comp.select(F.col("id").alias("id_b"), "pos", F.col("comp").alias("c_b"))
    dots = (
        cand.join(ca, "id_a")
        .join(cb, ["id_b", "pos"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("c_a") * F.col("c_b")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("n2").alias("n2_b"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "sim",
            F.col("dot").cast("double")
            / F.sqrt(F.col("n2_a").cast("double") * F.col("n2_b").cast("double")),
        )
        .filter(F.col("sim") >= F.lit(threshold))
        .select("id_a", "id_b", "sim")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    k_clusters: int = 8,
    hierarchical: bool = False,
    nprobe_super: int = 2,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding space,
    then compare pairs ONLY within each cluster and drop every vector with
    a same-cluster mate of smaller id at/above the cosine threshold.

    Returns (id, cluster, kept boolean) for every vector with a valid
    (non-empty, non-zero-quantizing) embedding.

    Deviations from the paper (Abbas et al. 2023), both deterministic by
    design: centroids are the md5-seeded pseudo-random sample of
    _seeded_centroids (no Lloyd iterations — the whole index stays a
    closed-form relational plan with an exact SQL twin), and the survivor
    of a near-dup pair is the MIN id rather than the member farthest from
    the centroid (an id is stable across reruns; a float distance argmax
    is not).

    Scale shape: clustering is what makes semantic dedup tractable — the
    candidate self-join is per-cluster, so pair cost is sum(|cluster|^2)/2
    instead of N^2/2. k_clusters is the dial: grow it ~N/target_cluster_size
    (the paper uses 50k clusters for LAION-scale corpora) and the per-
    cluster quadratic stays bounded while the assignment pass stays a
    broadcast-NLJ over K centroid rows. The pair stream carries the two
    micro-unit arrays only inside the in-row dot projection — one row per
    pair, never ×dim.
    """
    uv = _uvectors(df, id_col, vec_col).cache()
    if hierarchical:
        # the large-K configuration: two-level probing cuts the N x K
        # assignment to ~N*(sqrt(K) + nprobe*K/sqrt(K)) — see
        # hierarchical_assign for the exactness anchor and recall dial
        asg = hierarchical_assign(
            df, id_col, vec_col, k_clusters, nprobe_super=nprobe_super, uv=uv
        )
    elif k_clusters >= _NP_KERNEL_MIN_K:
        asg = _np_top1_assign(uv, _seeded_centroids(uv, k_clusters))
    else:
        asg = _flat_top1_relational(uv, _seeded_centroids(uv, k_clusters))
    # per-cluster pair pass: one Arrow group pass computing the member
    # Gram matrix blockwise (see _np_cluster_dedup) — same pairs/sims/
    # min-id survivor rule as the former per-cluster self-join + distinct
    # + left-join assembly, with ONE member shuffle instead of a shuffled
    # pair stream carrying both vectors per pair row.
    withvec = asg.join(uv, "id")
    return _np_cluster_dedup(withvec, threshold)


def kmeans_refine_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k_clusters: int = 8,
    iters: int = 1,
    hierarchical: bool = False,
    nprobe_super: int = 2,
    branch: int | None = None,
) -> DataFrame:
    """Deterministic Lloyd-refined clustering: md5-seeded centroids, then
    `iters` rounds of (assign -> exact-integer mean -> reassign). Returns
    (id, cluster, cluster0) — the refined and the seeded assignment — so
    callers can measure movement.

    This is the index-quality upgrade for ivf_topk/semantic_dedup: the
    seeded sample is unbiased but ignores density; one or two Lloyd rounds
    pull centroids toward mass and equalize cluster occupancy (tighter
    IVF probes, fewer quadratic outlier clusters for SemDeDup). Unlike
    textbook float k-means, every step here is exact integer arithmetic
    (truncated-mean re-quantization onto the micro-unit grid), so the
    fixpoint of each round is bit-identical across engines, partitionings,
    and reruns — an ITERATIVE algorithm expressed as a deterministic
    relational plan.

    Scale: each round is one explode + groupBy(cluster, pos) over N*dim
    rows (the same shuffle family as lsh_buckets' projections) plus a
    broadcast-NLJ reassignment; K never touches the shuffle width. Rounds
    are a driver-side Python loop over lazy plans — `iters` is small (1-2)
    by design, the paper-standard budget for index building.

    ``hierarchical=True`` swaps EVERY flat N x K assignment (the seeded
    pass plus both sides of each Lloyd round) for the two-level probe of
    `hierarchical_assign` — ~N*(branch + nprobe_super*K/branch) dots per
    pass, the large-K configuration (SCALE.md round-6 measured flat
    refinement at 10.1s for k=320 where the two-level pass costs ~2.6x
    less per assignment). Supers are re-seeded from each round's CURRENT
    centroid set, so refined centroids get a refined routing level too.
    With nprobe_super >= branch the probe is exhaustive and the result is
    bit-equal to hierarchical=False (the pytest anchor); smaller
    nprobe_super trades the usual IVF recall for speed.
    """
    uv = _uvectors(df, id_col, vec_col).cache()
    br = branch or max(1, int(k_clusters ** 0.5 + 0.999999))
    use_np = hierarchical or k_clusters >= _NP_KERNEL_MIN_K

    def top1(side: DataFrame, cents: DataFrame) -> DataFrame:
        if hierarchical:
            return _np_two_level_assign(side, cents, nprobe_super, br)
        if use_np:
            return _np_top1_assign(side, cents)
        return _flat_top1_relational(side, cents)

    asg0 = top1(uv, _seeded_centroids(uv, k_clusters))
    if use_np and iters > 0:
        # the kernel arm re-reads asg0 through a driver collect each round
        # (the Lloyd centroids pass through the driver) AND in the final
        # join — persist the tiny (id, cluster) relation so it computes once
        asg0 = asg0.persist()
    asg = asg0
    for _ in range(iters):
        if use_np:
            # no lineage cut needed: each round's centroids pass through
            # the driver (bounded K-row collect in the kernel), so the next
            # assignment's plan is always a flat one-pass over cached uv
            asg = top1(uv, _np_refined_centroids(uv, asg))
        else:
            # relational arm: centroids stay a broadcast PLAN (no driver
            # action at all); localCheckpoint cuts the growing lineage
            asg = top1(uv, _refined_centroids(uv, asg)).localCheckpoint(
                eager=False
            )
    return (
        asg.join(asg0.withColumnRenamed("cluster", "cluster0"), "id")
        .select("id", "cluster", "cluster0")
    )


def feature_hash_embed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 16,
) -> DataFrame:
    """Feature-hashing ("hashing trick") bag-of-words embedding: every
    token maps to bucket md5_60(token) % dim with a ±1 sign from an
    independent hash bit, and the document's vector is the per-bucket
    signed token count — the classic way to produce FIXED-dimension text
    vectors with no vocabulary, no training, and no driver state
    (Weinberger et al. 2009). The bridge from the text stack into the
    similarity/dedup stack when no model embeddings exist.

    Returns EXPLODED (id, pos, val) rows — only occupied buckets, exactly
    what the `_components`-based consumers (lsh_buckets, cosine paths)
    take as input. One token explode + one hash agg on (id, pos); integer-
    exact, engine-deterministic. dim is the usual dial (hash collisions
    average out under the signed sum; grow dim to cut collision variance).
    """
    from ..functions.text import ws_tokens

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(ws_tokens(F.col(text_col))).alias("tok"),
    )
    hv = md5_long(F.col("tok"))
    return (
        toks.select(
            "id",
            (hv % dim).cast("int").alias("pos"),
            # sign from bit 40: INDEPENDENT of the bucket (hv % dim uses
            # the low bits) for any dim < 2^40 — a low sign bit would make
            # all of a bucket's collisions share one sign and add instead
            # of cancelling, the property the signed sum exists for
            F.when(F.shiftright(hv, 40) % 2 == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("s"),
        )
        .groupBy("id", "pos")
        .agg(F.sum("s").cast("long").alias("val"))
    )


def hierarchical_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k_clusters: int,
    nprobe_super: int = 2,
    branch: int | None = None,
    uv: DataFrame | None = None,
) -> DataFrame:
    """Two-level cluster assignment — the scale fix for the N x K
    broadcast-NLJ that flat assignment pays (SCALE.md round-6: at k=320
    the assignment, not the pair stage, dominates semantic_dedup).

    The K md5-seeded centroids are themselves grouped under `branch`
    (default ceil(sqrt(K))) super-centroids (the same md5-seeded sampling,
    applied to the centroid set); a vector probes its `nprobe_super`
    nearest supers (N x branch dots), then argmaxes only over those
    supers' member centroids (N x nprobe_super*K/branch expected dots) —
    total ~N*(branch + nprobe_super*K/branch) vs N*K, the classic
    IVF-within-IVF trick.

    Approximation contract: with nprobe_super >= branch the candidate set
    is ALL centroids and the result is EXACTLY flat assignment (the pytest
    anchor); smaller nprobe_super trades recall for the usual probe
    miss — same dial family as ivf_topk's nprobe. Returns (id, cluster).

    `uv` lets a caller already holding the cached _uvectors relation
    (semantic_dedup) pass it in instead of paying the scan + quantization
    and a second cache twice.
    """
    if uv is None:
        uv = _uvectors(df, id_col, vec_col).cache()
    cents = _seeded_centroids(uv, k_clusters)
    branch = branch or max(1, int(k_clusters ** 0.5 + 0.999999))
    return _np_two_level_assign(uv, cents, nprobe_super, branch)
