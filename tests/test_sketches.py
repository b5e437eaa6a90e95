"""frequent_items (two-pass exact Misra-Gries heavy hitters) — completeness
and exactness pins. The KMV sketch family is covered by its driver gate and
tests/test_property.py; this file owns the frequency sketch."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from brontes_spark.operators.sketches import frequent_items


def _plain(df, num, den):
    """The full-shuffle reference plan: groupBy-count, filter by fraction."""
    total = df.filter(F.col("v").isNotNull()).count()
    return {
        (r["v"], r["n"])
        for r in df.filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * den > num * total)
        .collect()
    }


@pytest.mark.slow
def test_frequent_items_equals_groupby_any_partitioning(spark):
    rng = random.Random(41)
    # zipf-ish: token i appears ~N/(i+1) times
    vals = []
    for i in range(60):
        vals += [f"tok{i}"] * (2000 // (i + 1))
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    want = _plain(df, 1, 50)
    assert want  # the head of the zipf curve IS heavy
    for parts in (1, 7, 32):
        got = {
            (r["v"], r["n"])
            for r in frequent_items(
                df.repartition(parts), "v", freq_num=1, freq_den=50
            ).collect()
        }
        assert got == want, parts
        # every returned total is the true row count
        totals = {
            r["total"]
            for r in frequent_items(
                df.repartition(parts), "v", freq_num=1, freq_den=50
            ).collect()
        }
        assert totals == {len(vals)}


def test_frequent_items_adversarial_completeness(spark):
    """Heavy items barely above threshold drowned in a sea of distincts,
    with the MINIMUM default counter budget — the pigeonhole guarantee is
    what keeps them in the candidate set."""
    n_noise = 9000
    rows = [(f"noise{i}",) for i in range(n_noise)]
    # three heavy items, each just above 5% of the final total
    total = n_noise + 3 * 600
    assert 600 * 20 > 1 * total  # > 1/20th
    for h in ("hot_a", "hot_b", "hot_c"):
        rows += [(h,)] * 600
    random.Random(7).shuffle(rows)
    df = spark.createDataFrame(rows, "v string").repartition(32)
    got = {
        r["v"]: r["n"]
        for r in frequent_items(df, "v", freq_num=1, freq_den=20).collect()
    }
    assert got == {"hot_a": 600, "hot_b": 600, "hot_c": 600}


def test_frequent_items_int_keys_nulls_and_edges(spark):
    df = spark.createDataFrame(
        [(1,)] * 30 + [(2,)] * 5 + [(None,)] * 40, "v long"
    )
    # nulls are excluded from both counts and the total (35 non-null rows)
    got = {
        (r["v"], r["n"], r["total"])
        for r in frequent_items(df, "v", freq_num=1, freq_den=2).collect()
    }
    assert got == {(1, 30, 35)}
    # no heavy hitters above 99%
    assert frequent_items(df, "v", freq_num=99, freq_den=100).count() == 0
    # empty input
    empty = spark.createDataFrame([], "v string")
    assert frequent_items(empty, "v").count() == 0
    with pytest.raises(ValueError):
        frequent_items(df, "v", freq_num=0, freq_den=5)
    with pytest.raises(ValueError):
        frequent_items(df, "v", freq_num=5, freq_den=5)


def test_frequent_items_duckdb_parity(spark):
    """Exact SQL-twin parity (the shape an r8 driver gate will pin):
    DuckDB computes the same groupBy-fraction plan over the same rows."""
    import duckdb

    rng = random.Random(99)
    vals = [f"w{rng.randrange(40) ** 2 % 97}" for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        (r["v"], r["n"], r["total"])
        for r in frequent_items(
            df.repartition(16), "v", freq_num=3, freq_den=100
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = {
        tuple(r)
        for r in con.execute(
            "SELECT v, COUNT(*) AS n, (SELECT COUNT(*) FROM t) AS total "
            "FROM t GROUP BY v HAVING COUNT(*) * 100 > 3 * (SELECT COUNT(*) FROM t)"
        ).fetchall()
    }
    assert got == want and got


def test_quantiles_exact_matches_sorted_reference(spark):
    import math
    import random

    from brontes_spark.operators.sketches import quantiles_exact

    rng = random.Random(21)
    # heavy ties + wide outliers + negatives: the bucket math must stay
    # exact across the full long range direction
    vals = (
        [rng.randrange(-50, 50) for _ in range(3000)]
        + [7] * 500
        + [rng.randrange(10**12, 10**13) for _ in range(20)]
        + [-(10**15)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    qs = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = {
        r["q"]: (r["rank"], r["value"])
        for r in quantiles_exact(df.repartition(16), "v", qs).collect()
    }
    ordered = sorted(vals)
    n = len(vals)
    for q in qs:
        rank = max(1, math.ceil(q * n))
        assert got[q] == (rank, ordered[rank - 1]), q


def test_quantiles_exact_edges(spark):
    import pytest

    from brontes_spark.operators.sketches import quantiles_exact

    # all-equal values: every quantile is that value
    df = spark.createDataFrame([(42,)] * 100, "v long")
    got = {r["q"]: r["value"] for r in quantiles_exact(df, "v", [0.1, 0.5, 1.0]).collect()}
    assert got == {0.1: 42, 0.5: 42, 1.0: 42}
    # nulls excluded; single row
    df2 = spark.createDataFrame([(None,), (5,)], "v long")
    assert [
        (r["rank"], r["value"])
        for r in quantiles_exact(df2, "v", [0.5]).collect()
    ] == [(1, 5)]
    # empty input -> empty result
    empty = spark.createDataFrame([], "v long")
    assert quantiles_exact(empty, "v", [0.5]).count() == 0
    with pytest.raises(ValueError):
        quantiles_exact(df, "v", [1.5])
    with pytest.raises(ValueError):
        quantiles_exact(df, "v", [])


def test_quantiles_exact_duckdb_parity(spark):
    """The r8-gate shape: DuckDB's quantile_disc over the same rows (its
    'lower' discrete convention picks index floor... verified against the
    explicit ORDER BY/OFFSET form to avoid convention drift)."""
    import math
    import random

    import duckdb

    from brontes_spark.operators.sketches import quantiles_exact

    rng = random.Random(31)
    vals = [rng.randrange(0, 10**6) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    qs = [0.05, 0.5, 0.95]
    got = {
        r["q"]: (r["rank"], r["value"])
        for r in quantiles_exact(df.repartition(8), "v", qs).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    n = len(vals)
    for q in qs:
        rank = max(1, math.ceil(q * n))
        want = con.execute(
            f"SELECT v FROM t ORDER BY v LIMIT 1 OFFSET {rank - 1}"
        ).fetchone()[0]
        assert got[q] == (rank, want), q


def test_sketch_operators_randomized_sweep(spark):
    """Seeded random sweep (the repo's Spark-side property-test idiom):
    frequent_items vs the full groupBy plan and quantiles_exact vs the
    sorted list, across random shapes, fractions, and bucket counts."""
    import math
    import random

    from brontes_spark.operators.sketches import frequent_items, quantiles_exact

    for seed in (3, 19, 67):
        rng = random.Random(seed)
        n_vals = rng.randrange(200, 2500)
        zipf_head = rng.randrange(2, 9)
        vals = [
            f"k{min(rng.randrange(1, 10**rng.randrange(1, 4)), i % 50)}"
            if rng.random() < 0.5 else f"u{i}"
            for i in range(n_vals)
        ] + [f"h{j}" for j in range(zipf_head) for _ in range(n_vals // zipf_head)]
        rng.shuffle(vals)
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        num, den = rng.choice([(1, 20), (1, 50), (3, 100)])
        got = {
            (r["v"], r["n"])
            for r in frequent_items(
                df.repartition(rng.choice([1, 5, 32])), "v",
                freq_num=num, freq_den=den,
            ).collect()
        }
        assert got == _plain(df, num, den), seed

        ivals = [rng.randrange(-10**6, 10**6) for _ in range(n_vals)]
        idf = spark.createDataFrame([(v,) for v in ivals], "v long")
        qs = sorted({round(rng.random(), 3) for _ in range(4)})
        res = {
            r["q"]: (r["rank"], r["value"])
            for r in quantiles_exact(
                idf, "v", qs, buckets=rng.choice([16, 257, 4096])
            ).collect()
        }
        ordered = sorted(ivals)
        for q in qs:
            rank = max(1, math.ceil(q * len(ivals)))
            assert res[q] == (rank, ordered[rank - 1]), (seed, q)


# ---------------------------------------------------------------- count-min


def _cm_vals(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_countmin_overestimates_never_under(spark):
    from brontes_spark.operators.sketches import countmin_estimate, countmin_sketch

    rng = random.Random(7)
    vals = [f"t{rng.randint(0, 80)}" for _ in range(3000)]
    df = _cm_vals(spark, vals)
    # width 32 << 81 distinct values: collisions guaranteed
    sk = countmin_sketch(df, "v", width=32, depth=4)
    est = {
        r.v: r.est
        for r in countmin_estimate(df.distinct(), sk, "v", width=32, depth=4).collect()
    }
    exact = {r.v: r["count"] for r in df.groupBy("v").count().collect()}
    assert all(est[v] >= c for v, c in exact.items())
    # min-over-depth beats the worst row: total overcount stays bounded by
    # the per-row expectation N/width summed over items (loose 2x envelope)
    over = sum(est[v] - c for v, c in exact.items())
    assert over <= 2 * len(exact) * len(vals) // 32


def test_countmin_exact_when_wide(spark):
    from brontes_spark.operators.sketches import countmin_estimate, countmin_sketch

    vals = [f"u{i}" for i in range(40) for _ in range(i + 1)]
    df = _cm_vals(spark, vals)
    sk = countmin_sketch(df, "v", width=4096, depth=4)
    est = {
        r.v: r.est
        for r in countmin_estimate(
            df.distinct(), sk, "v", width=4096, depth=4
        ).collect()
    }
    exact = {r.v: r["count"] for r in df.groupBy("v").count().collect()}
    assert est == exact  # 40 values in 4096 cells x 4 rows: no collision


def test_countmin_merge_equals_full_build(spark):
    from brontes_spark.operators.sketches import countmin_merge, countmin_sketch

    vals = [f"w{i % 13}" for i in range(400)]
    full = {
        (r.row, r.col): r.cnt
        for r in countmin_sketch(_cm_vals(spark, vals), "v", 64, 3).collect()
    }
    a = countmin_sketch(_cm_vals(spark, vals[:150]), "v", 64, 3)
    b = countmin_sketch(_cm_vals(spark, vals[150:]), "v", 64, 3)
    merged = {(r.row, r.col): r.cnt for r in countmin_merge(a, b).collect()}
    assert merged == full


def test_countmin_unseen_item_is_zero_or_collision(spark):
    from brontes_spark.operators.sketches import countmin_estimate, countmin_sketch

    sk = countmin_sketch(_cm_vals(spark, ["a", "b", "c"]), "v", width=4096, depth=4)
    est = {
        r.v: r.est
        for r in countmin_estimate(
            _cm_vals(spark, ["zebra"]), sk, "v", width=4096, depth=4
        ).collect()
    }
    assert est["zebra"] == 0


def test_countmin_bad_params(spark):
    from brontes_spark.operators.sketches import countmin_sketch

    with pytest.raises(ValueError):
        countmin_sketch(_cm_vals(spark, ["a"]), "v", width=0)


# ------------------------------------------------------- KMV set relations


def test_kmv_set_relations_exact_small_regime(spark):
    from brontes_spark.operators.sketches import kmv_set_relations, kmv_sketch

    # union < k: every figure must be exact
    a = spark.createDataFrame([("g", f"x{i}") for i in range(20)], "key string, v string")
    b = spark.createDataFrame(
        [("g", f"x{i}") for i in range(10, 30)], "key string, v string"
    )
    out = kmv_set_relations(
        kmv_sketch(a, "key", "v", k=64), kmv_sketch(b, "key", "v", k=64), k=64
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_union_seen == 30 and r.est_union == 30
    assert r.n_both == 10 and r.est_intersect == 10
    assert abs(r.jaccard_est - 10 / 30) < 1e-12


def test_kmv_set_relations_estimate_accuracy(spark):
    from brontes_spark.operators.sketches import kmv_set_relations, kmv_sketch

    # |A| = |B| = 3000, overlap 1000 -> union 5000, jaccard 0.2
    a = spark.createDataFrame([("g", f"v{i}") for i in range(3000)], "key string, v string")
    b = spark.createDataFrame(
        [("g", f"v{i}") for i in range(2000, 5000)], "key string, v string"
    )
    k = 256
    r = kmv_set_relations(
        kmv_sketch(a, "key", "v", k=k), kmv_sketch(b, "key", "v", k=k), k=k
    ).collect()[0]
    assert r.n_union_seen == k
    assert abs(r.est_union - 5000) / 5000 < 0.25   # ~1/sqrt(k) error regime
    assert abs(r.jaccard_est - 0.2) < 0.1
    assert abs(r.est_intersect - 1000) / 1000 < 0.45


def test_kmv_set_relations_disjoint(spark):
    from brontes_spark.operators.sketches import kmv_set_relations, kmv_sketch

    a = spark.createDataFrame([("g", f"a{i}") for i in range(500)], "key string, v string")
    b = spark.createDataFrame([("g", f"b{i}") for i in range(500)], "key string, v string")
    r = kmv_set_relations(
        kmv_sketch(a, "key", "v", k=64), kmv_sketch(b, "key", "v", k=64), k=64
    ).collect()[0]
    assert r.n_both == 0 and r.jaccard_est == 0.0 and r.est_intersect == 0


# ---------------------------------------------------------------- histogram


def test_value_histogram_tiles_exactly(spark):
    from brontes_spark.operators.sketches import value_histogram

    rng = random.Random(5)
    vals = [rng.randrange(-500, 10_000) for _ in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = sorted(tuple(r) for r in value_histogram(df, "v", buckets=32).collect())
    assert sum(r[3] for r in rows) == len(vals)
    assert rows[0][1] == min(vals) and rows[-1][2] == max(vals)
    for a, b in zip(rows, rows[1:]):
        # adjacent occupied buckets may skip empty ones, but bounds never
        # overlap and every value maps into its bucket's [lo, hi]
        assert b[1] > a[2]
    by_bucket = {r[0]: r for r in rows}
    span = max(vals) - min(vals) + 1
    for v in vals[:200]:
        k = ((v - min(vals)) * 32) // span
        _, lo, hi, _ = by_bucket[k]
        assert lo <= v <= hi, (v, k, lo, hi)


def test_value_histogram_edge_cases(spark):
    from brontes_spark.operators.sketches import value_histogram

    # constant column: one bucket covering exactly that value
    df = spark.createDataFrame([(7,)] * 10, "v long")
    rows = [tuple(r) for r in value_histogram(df, "v", buckets=8).collect()]
    assert rows == [(0, 7, 7, 10)]
    # empty input: empty frame with the right schema
    empty = spark.createDataFrame([], "v long")
    out = value_histogram(empty, "v", buckets=8)
    assert out.count() == 0 and out.columns == ["bucket", "lo", "hi", "cnt"]
    import pytest
    with pytest.raises(ValueError):
        value_histogram(df, "v", buckets=0)


def test_kmv_containment_exact_below_k_and_asymmetric(spark):
    # A = 30 values wholly inside B's 300: containment(A in B) == 1.0
    # exactly in the below-k regime; (B in A) == |A|/|B| == 0.1
    from brontes_spark.operators.sketches import kmv_containment, kmv_sketch

    a_rows = [("k", f"v{i}") for i in range(30)]
    b_rows = [("k", f"v{i}") for i in range(300)]
    a = kmv_sketch(spark.createDataFrame(a_rows, "key string, v string"), "key", "v", k=512)
    b = kmv_sketch(spark.createDataFrame(b_rows, "key string, v string"), "key", "v", k=512)
    r = kmv_containment(a, b, k=512).collect()[0]
    assert (r.n_a, r.n_b, r.n_both, r.n_union_seen) == (30, 300, 30, 300)
    assert r.containment_a_in_b == 1.0
    assert r.containment_b_in_a == 30 / 300


def test_kmv_containment_estimates_above_k(spark):
    # above k the ratio is an estimate: 2000 values, A = first 400 (all in
    # B) -> containment(A in B) must still read ~1.0 and (B in A) ~0.2
    from brontes_spark.operators.sketches import kmv_containment, kmv_sketch

    a_rows = [("k", f"x{i}") for i in range(400)]
    b_rows = [("k", f"x{i}") for i in range(2000)]
    a = kmv_sketch(spark.createDataFrame(a_rows, "key string, v string"), "key", "v", k=128)
    b = kmv_sketch(spark.createDataFrame(b_rows, "key string, v string"), "key", "v", k=128)
    r = kmv_containment(a, b, k=128).collect()[0]
    assert r.containment_a_in_b == 1.0  # every A hash IS in B: exact even estimated
    assert abs(r.containment_b_in_a - 0.2) < 0.15


def test_percentiles_cont_matches_numpy_and_disc_on_exact_hits(spark):
    import numpy as np

    from brontes_spark.operators.sketches import percentiles_cont

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]  # n=11
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    qs = [(1, 4), (1, 2), (3, 4), (0, 1), (1, 1)]
    rows = {(r.q_num, r.q_den): r for r in percentiles_cont(df, "v", qs).collect()}
    for nu, d in qs:
        want = float(np.percentile(np.array(vals, dtype=float), 100 * nu / d,
                                   method="linear"))
        assert rows[(nu, d)].value_cont == want, (nu, d)
    # n-1 divisible by den -> exact order statistic, rem == 0, v_lo == v_hi
    r = rows[(1, 2)]
    assert r.rem == 0 and r.v_lo == r.v_hi == 4


def test_percentiles_cont_interpolates_between_neighbors(spark):
    from brontes_spark.operators.sketches import percentiles_cont

    df = spark.createDataFrame([(10,), (20,)], "v long")  # n=2
    r = percentiles_cont(df, "v", [(1, 4)]).collect()[0]
    # p = 1/4 * 1 -> between ranks 1 and 2 with weight 1/4
    assert (r.rank_lo, r.rem, r.v_lo, r.v_hi) == (1, 1, 10, 20)
    assert r.value_cont == 12.5


def test_percentiles_cont_guards_and_empty(spark):
    import pytest as _pytest

    from brontes_spark.operators.sketches import percentiles_cont

    df = spark.createDataFrame([(1,)], "v long")
    with _pytest.raises(ValueError):
        percentiles_cont(df, "v", [(3, 2)])
    empty = spark.createDataFrame([], "v long")
    assert percentiles_cont(empty, "v", [(1, 2)]).count() == 0


# ------------------------------------------------- join size estimation


def test_join_size_estimate_uniform_band(spark):
    from pyspark.sql import functions as F

    from brontes_spark.operators.sketches import join_size_estimate

    a = spark.range(1000).select(F.explode(F.array_repeat(F.col("id"), 3)).alias("k"))
    b = spark.range(500, 1500).select(F.explode(F.array_repeat(F.col("id"), 2)).alias("k"))
    est = join_size_estimate(a, b, "k", "k", k=256).collect()[0]
    true = a.join(b, "k").count()
    assert true == 3000
    assert est["rows_a"] == 3000 and est["rows_b"] == 2000
    # KMV band ~1/sqrt(256) per figure: allow 25% end to end
    assert 0.75 * true <= est["est_join_rows"] <= 1.25 * true


def test_join_size_estimate_exact_small_regime(spark):
    from brontes_spark.operators.sketches import join_size_estimate

    # distinct union (40) < k: every sketch figure exact, multiplicity
    # uniform (1) -> the estimate IS the true join size
    a = spark.range(30).selectExpr("id AS k")
    b = spark.range(10, 50).selectExpr("id AS k")
    est = join_size_estimate(a, b, "k", "k", k=256).collect()[0]
    assert est["est_key_overlap"] == 20
    assert est["est_join_rows"] == a.join(b, "k").count() == 20


def test_join_size_estimate_disjoint_is_zero(spark):
    from brontes_spark.operators.sketches import join_size_estimate

    a = spark.range(100).selectExpr("id AS k")
    b = spark.range(1000, 1100).selectExpr("id AS k")
    est = join_size_estimate(a, b, "k", "k", k=128).collect()[0]
    assert est["est_key_overlap"] == 0 and est["est_join_rows"] == 0


def test_join_size_estimate_underestimates_skew_as_documented(spark):
    from pyspark.sql import functions as F

    from brontes_spark.operators.sketches import join_size_estimate

    # one hot key with 1000 copies on each side: true join has a 1e6-row
    # blowup the frequency-blind sketch cannot see — the documented limit
    hot = spark.range(1).select(F.explode(F.array_repeat(F.lit(7), 1000)).alias("k"))
    base = spark.range(100).selectExpr("id AS k")
    a = base.unionAll(hot)
    b = base.unionAll(hot)
    est = join_size_estimate(a, b, "k", "k", k=128).collect()[0]
    true = a.join(b, "k").count()
    assert true > 10**6
    assert est["est_join_rows"] < true  # under, never silently over
