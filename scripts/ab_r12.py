"""Interleaved same-session A/B harness (round 12).

Usage: python scripts/ab_r12.py <case> [--pairs N] [--runs N] [--skip-parity]

Method (VERDICT r11 directive 1): base and variant alternate inside ONE
session (base, variant, base, variant, ...), min-of-`runs` per arm per
pass, `spark.catalog.clearCache()` before every sample so persist()/cache()
inside a query body cannot leak across samples. The interleaving is the
only protocol that survives this box's load windows — whole-bench reruns
drift 15-20% between runs (OPTIMIZATION_r11.md "Measurement honesty").

Before timing, each case proves result parity: both arms collected once,
sorted, compared row-for-row (disable with --skip-parity for re-timing
passes only).

"base" arms are verbatim local copies of the round-11 formulation frozen
at commit d17ee8c; "new" arms call the live operator.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ---------------------------------------------------------------- inputs

def _trade_graph(spark):
    """The g12/g14 customer-supplier trade graph + supplier seeds."""
    from brontes_spark.sources.testdata import load_table

    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    seeds = (
        load_table(spark, SF, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    return edges, seeds


# ------------------------------------------------------ frozen r11 bases

def _ppr_r11(edges, seeds, iters=3, scale=10**9, d_num=85, d_den=100,
             checkpoint_every=4, persist_static=True):
    """ppr_integer as of r11 (persist_static=True) / the no-persist
    variant aligned with g7's formulation (persist_static=False)."""
    e = edges.select(F.col("src"), F.col("dst")).distinct()
    if persist_static:
        e = e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if persist_static:
        nodes = nodes.persist()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_deg = e.join(outdeg, "src")
    s = seeds.select("node").distinct()
    n_nodes, n_seeds = nodes.count(), s.count()
    start = (scale * n_nodes) // n_seeds
    seed_teleport = ((d_den - d_num) * scale * n_nodes) // (d_den * n_seeds)
    flagged = nodes.join(
        s.withColumn("_is_seed", F.lit(1)), "node", "left"
    ).select("node", F.coalesce(F.col("_is_seed"), F.lit(0)).alias("is_seed"))
    ranks = flagged.select(
        "node", (F.col("is_seed") * F.lit(start)).cast("long").alias("rank")
    )
    for t in range(1, iters + 1):
        contrib = (
            ranks.join(e_deg, ranks["node"] == e_deg["src"], "inner")
            .select("dst", F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = flagged.join(
            contrib, flagged["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.col("is_seed") * F.lit(seed_teleport)
                + F.expr(f"({d_num} * coalesce(s, 0)) div {d_den}")
            ).cast("long").alias("rank"),
        )
        if t % checkpoint_every == 0 and t < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def _bfs_r11(edges, seeds, rounds):
    """bfs_nearest_seed as of r11: no frontier dispatch, plain joins."""
    edges = edges.localCheckpoint(eager=False)
    settled = (
        seeds.select("node")
        .distinct()
        .select("node", F.lit(0).alias("dist"), F.col("node").alias("root"))
        .localCheckpoint(eager=False)
    )
    frontier = settled
    for r in range(1, rounds + 1):
        cand = (
            edges.join(frontier.select(F.col("node").alias("s"), "root"), "s")
            .groupBy(F.col("t").alias("node"))
            .agg(F.min("root").alias("root"))
        )
        new = (
            cand.join(settled.select("node"), "node", "left_anti")
            .select("node", F.lit(r).alias("dist"), "root")
            .localCheckpoint(eager=False)
        )
        settled = settled.unionAll(new).localCheckpoint(eager=False)
        frontier = new
    return settled


def _minhash_pairs_r11(df, id_col, text_col, n=3, num_hashes=16, band_size=4):
    """minhash_lsh_pairs as of r11: banded self-join (pipeline planned 2x)."""
    from brontes_spark.operators.dedup import _lsh_band_signatures

    banded = _lsh_band_signatures(df, id_col, text_col, n, num_hashes, band_size)
    a = banded.select("band", "band_sig", F.col("id").alias("id_a"))
    b = banded.select("band", "band_sig", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _sssp_cadence_r11(edges, seeds, rounds, checkpoint_every=4):
    """sssp_bellman_ford as of r11: shuffled join + cadence cuts."""
    edges = edges.localCheckpoint(eager=False)
    dist = (
        seeds.select("node")
        .distinct()
        .select("node", F.lit(0).alias("dist"), F.col("node").alias("root"))
    )
    for t in range(1, rounds + 1):
        cand = edges.join(
            dist.select(F.col("node").alias("s"), "dist", "root"), "s"
        ).select(
            F.col("t").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
            "root",
        )
        dist = (
            dist.unionAll(cand)
            .groupBy("node")
            .agg(F.expr("min_by(struct(dist, root), struct(dist, root))").alias("_m"))
            .select("node", F.col("_m.dist").alias("dist"),
                    F.col("_m.root").alias("root"))
        )
        if t % checkpoint_every == 0 and t < rounds:
            dist = dist.localCheckpoint(eager=False)
    return dist


def _sssp_bcast(edges, seeds, rounds, broadcast_rows=2_000_000):
    """g13 VARIANT: per-round lazy cut + count + broadcast-dist edge join."""
    edges = edges.localCheckpoint(eager=False)
    dist = (
        seeds.select("node")
        .distinct()
        .select("node", F.lit(0).alias("dist"), F.col("node").alias("root"))
        .localCheckpoint(eager=False)
    )
    for t in range(1, rounds + 1):
        n_dist = dist.count()
        d = dist.select(F.col("node").alias("s"), "dist", "root")
        if n_dist <= broadcast_rows:
            d = F.broadcast(d)
        cand = edges.join(d, "s").select(
            F.col("t").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
            "root",
        )
        dist = (
            dist.unionAll(cand)
            .groupBy("node")
            .agg(F.expr("min_by(struct(dist, root), struct(dist, root))").alias("_m"))
            .select("node", F.col("_m.dist").alias("dist"),
                    F.col("_m.root").alias("root"))
        )
        if t < rounds:
            dist = dist.localCheckpoint(eager=False)
    return dist


# ----------------------------------------------------------------- cases

def _case_ppr(spark):
    edges, seeds = _trade_graph(spark)
    return {
        "persist(r11)": lambda: _ppr_r11(edges, seeds, persist_static=True),
        "nopersist(g7-style)": lambda: _ppr_r11(edges, seeds, persist_static=False),
    }


def _case_ppr_live(spark):
    """Live operator vs the frozen loser — confirms the ported winner."""
    from brontes_spark.operators.pagerank import ppr_integer

    edges, seeds = _trade_graph(spark)
    return {
        "live": lambda: ppr_integer(edges, seeds, iters=3),
        "persist(r11)": lambda: _ppr_r11(edges, seeds, persist_static=True),
    }


def _case_ppr3(spark):
    """Three arms in one session: live (ported no-persist), frozen
    persist, frozen no-persist — separates code diff from arm order."""
    from brontes_spark.operators.pagerank import ppr_integer

    edges, seeds = _trade_graph(spark)
    return {
        "persist(r11)": lambda: _ppr_r11(edges, seeds, persist_static=True),
        "live": lambda: ppr_integer(edges, seeds, iters=3),
        "nopersist(frozen)": lambda: _ppr_r11(edges, seeds, persist_static=False),
    }


def _case_bfs(spark):
    from brontes_spark.operators.bfs import bfs_nearest_seed

    edges, seeds = _trade_graph(spark)
    e = edges.select(F.col("src").alias("s"), F.col("dst").alias("t")).distinct()
    return {
        "r11-plain": lambda: _bfs_r11(e, seeds, rounds=3),
        "adaptive-bcast": lambda: bfs_nearest_seed(e, seeds, rounds=3),
    }


def _case_fuzzy(spark):
    from brontes_spark.operators.dedup import minhash_lsh_pairs
    from brontes_spark.operators.fuzzy import verify_pairs_levenshtein
    from brontes_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents")

    def base():
        cands = _minhash_pairs_r11(docs, "doc_id", "text", n=5, num_hashes=16, band_size=4)
        return verify_pairs_levenshtein(cands, docs, "doc_id", "text", max_dist=5)

    def new():
        cands = minhash_lsh_pairs(docs, "doc_id", "text", n=5, num_hashes=16, band_size=4)
        return verify_pairs_levenshtein(cands, docs, "doc_id", "text", max_dist=5)

    return {"selfjoin(r11)": base, "bucket-explode": new}


def _case_minhash(spark):
    from brontes_spark.operators.dedup import minhash_lsh_pairs
    from brontes_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents")
    return {
        "selfjoin(r11)": lambda: _minhash_pairs_r11(docs, "doc_id", "text", n=5),
        "bucket-explode": lambda: minhash_lsh_pairs(docs, "doc_id", "text", n=5),
    }


def _minhash_pairs_ckpt(df, id_col, text_col, n=3, num_hashes=16, band_size=4):
    """Self-join shape + ONE lazy cut on the banded pipeline: the
    shingle->MinHash pipeline computes once, both join sides read blocks."""
    from brontes_spark.operators.dedup import _lsh_band_signatures

    banded = _lsh_band_signatures(
        df, id_col, text_col, n, num_hashes, band_size
    ).localCheckpoint(eager=False)
    a = banded.select("band", "band_sig", F.col("id").alias("id_a"))
    b = banded.select("band", "band_sig", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _case_fuzzy3(spark):
    from brontes_spark.operators.dedup import minhash_lsh_pairs
    from brontes_spark.operators.fuzzy import verify_pairs_levenshtein
    from brontes_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents")

    def _arm(pairs_fn):
        def run():
            cands = pairs_fn(docs, "doc_id", "text", n=5, num_hashes=16, band_size=4)
            return verify_pairs_levenshtein(cands, docs, "doc_id", "text", max_dist=5)
        return run

    return {
        "selfjoin(r11)": _arm(_minhash_pairs_r11),
        "bucket-explode": _arm(minhash_lsh_pairs),
        "selfjoin+ckpt": _arm(_minhash_pairs_ckpt),
    }


def _case_sssp(spark):
    """Live operator (size-adaptive broadcast) vs frozen r11 cadence,
    both driven through the real g13 gate builder (input-identical)."""
    from brontes_spark.plans import queries

    q = queries()

    def _patched(fn):
        def run():
            import brontes_spark.operators.bfs as bfs_mod
            orig = bfs_mod.sssp_bellman_ford
            bfs_mod.sssp_bellman_ford = fn
            try:
                return q["g13_sssp_weighted"](spark, SF)
            finally:
                bfs_mod.sssp_bellman_ford = orig
        return run

    def live():
        return q["g13_sssp_weighted"](spark, SF)

    return {"cadence(r11)": _patched(_sssp_cadence_r11), "live-adaptive": live}


def _hits_r11(edges, src_col="src", dst_col="dst", rounds=3, checkpoint_every=4):
    """hits_integer as of r11: self-aliasing edge select."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    hub = nodes.withColumn("hub", F.lit(1).cast("long"))
    auth = None
    for t in range(1, rounds + 1):
        auth = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
            .select(F.col("dst").alias("node"), "auth")
        )
        hub = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
            .select(F.col("src").alias("node"), "hub")
        )
        if t % checkpoint_every == 0 and t < rounds:
            auth = auth.localCheckpoint(eager=False)
            hub = hub.localCheckpoint(eager=False)
    return (
        nodes.join(auth, "node", "left")
        .join(hub, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("auth"), F.lit(0)).alias("auth"),
            F.coalesce(F.col("hub"), F.lit(0)).alias("hub"),
        )
    )


def _pagerank_r11(edges, src_col="src", dst_col="dst", iters=3, scale=10**9,
                  d_num=85, d_den=100, checkpoint_every=4):
    """pagerank_integer as of r11: self-aliasing edge select."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_deg = e.join(outdeg, "src")
    teleport = (scale * (d_den - d_num)) // d_den
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for t in range(1, iters + 1):
        contrib = (
            ranks.join(e_deg, ranks["node"] == e_deg["src"], "inner")
            .select("dst", F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            (F.lit(teleport) + F.expr(f"({d_num} * coalesce(s, 0)) div {d_den}"))
            .cast("long").alias("rank"),
        )
        if t % checkpoint_every == 0 and t < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def _pmi_aggjoin(docs, text_col, window=3, min_count=2):
    """pmi_cooccur VARIANT: marginals via two map-side-combinable aggs +
    broadcast joins instead of two Exchange+Sort+Window passes."""
    from brontes_spark.operators.cooccur import skipgram_pairs

    pairs = skipgram_pairs(docs, text_col, window)
    c = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy")).cache()
    dim = c.agg(F.sum("n_xy").alias("t_pairs")).withColumn("j", F.lit(1))
    mx = c.groupBy("w1").agg(F.sum("n_xy").alias("n_x"))
    my = c.groupBy("w2").agg(F.sum("n_xy").alias("n_y"))
    c = c.join(F.broadcast(mx), "w1").join(F.broadcast(my), "w2")
    scored = (
        c.withColumn("j", F.lit(1))
        .join(F.broadcast(dim), "j")
        .drop("j")
        .withColumn(
            "lift9",
            F.expr(
                "CAST(n_xy AS DECIMAL(38,0)) * t_pairs"
                " * CAST(1000000000 AS DECIMAL(38,0))"
                " div (CAST(n_x AS DECIMAL(38,0)) * n_y)"
            ),
        )
    )
    return scored.filter(F.col("n_xy") >= min_count).select(
        "w1", "w2", "n_xy", "n_x", "n_y", F.col("lift9").cast("long").alias("lift9")
    )


def _case_pmi(spark):
    from brontes_spark.operators.cooccur import pmi_cooccur
    from brontes_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents")
    return {
        "window(live)": lambda: pmi_cooccur(docs, "text", window=3, min_count=2),
        "agg-join": lambda: _pmi_aggjoin(docs, "text", window=3, min_count=2),
    }


def _gate_patch_case(spark, gate, module_path, attr, frozen):
    """base = gate with `attr` monkeypatched to the frozen r11 copy;
    live = gate as-is."""
    import importlib

    from brontes_spark.plans import queries

    q = queries()
    mod = importlib.import_module(module_path)

    def patched():
        orig = getattr(mod, attr)
        setattr(mod, attr, frozen)
        try:
            return q[gate](spark, SF)
        finally:
            setattr(mod, attr, orig)

    return {f"r11({attr})": patched, "live": lambda: q[gate](spark, SF)}


def _case_hits(spark):
    return _gate_patch_case(
        spark, "g11_hits", "brontes_spark.operators.hits", "hits_integer", _hits_r11
    )


def _case_g7(spark):
    return _gate_patch_case(
        spark, "g7_pagerank", "brontes_spark.operators.pagerank",
        "pagerank_integer", _pagerank_r11,
    )


CASES = {
    "ppr": _case_ppr,
    "ppr_live": _case_ppr_live,
    "ppr3": _case_ppr3,
    "hits": _case_hits,
    "g7": _case_g7,
    "pmi": _case_pmi,
    "bfs": _case_bfs,
    "fuzzy": _case_fuzzy,
    "fuzzy3": _case_fuzzy3,
    "minhash": _case_minhash,
    "sssp": _case_sssp,
}


def main() -> None:
    case = sys.argv[1]
    pairs = int(_argval("--pairs", 3))
    runs = int(_argval("--runs", 3))
    parity = "--skip-parity" not in sys.argv

    from brontes_spark.session import get_spark

    spark = get_spark("ab-r12", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    arms = CASES[case](spark)

    if parity:
        rows = {}
        for name, build in arms.items():
            spark.catalog.clearCache()
            rows[name] = sorted(map(tuple, build().collect()))
        vals = list(rows.values())
        names = list(rows.keys())
        for i in range(1, len(vals)):
            assert vals[i] == vals[0], (
                f"PARITY FAIL {names[i]} vs {names[0]}: "
                f"{len(vals[i])} vs {len(vals[0])} rows"
            )
        print(f"parity OK: {len(vals[0])} rows identical across {names}")

    results: dict[str, list[float]] = {n: [] for n in arms}
    for p in range(pairs):
        for name, build in arms.items():
            best = float("inf")
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.time()
                build().count()
                best = min(best, time.time() - t0)
            results[name].append(round(best, 3))
            print(f"pass {p} {name}: {results[name][-1]}", flush=True)
    print("== summary ==")
    for name, mins in results.items():
        print(f"{name}: per-pass mins {mins}  overall min {min(mins)}")
    spark.stop()


def _argval(flag: str, default):
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


if __name__ == "__main__":
    main()
