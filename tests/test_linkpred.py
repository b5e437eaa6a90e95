"""Link-prediction scores (operators/linkpred.py) against a brute-force
neighbor-set mirror: CN / RA / Jaccard values, canonicalization, the
hub cap, and the min_common filter."""

from __future__ import annotations

RA_SCALE = 1_000_000_000_000


def _brute(edges, max_center_degree=None, min_common=1):
    und = {}
    es = set()
    for s, t in edges:
        if s == t:
            continue
        a, b = min(s, t), max(s, t)
        es.add((a, b))
    for a, b in es:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    deg = {n: len(ns) for n, ns in und.items()}
    out = {}
    nodes = sorted(und)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            common = [
                z for z in und[u] & und[v]
                if max_center_degree is None or deg[z] <= max_center_degree
            ]
            cn = len(common)
            if cn < min_common:
                continue
            ra = sum(RA_SCALE // deg[z] for z in common)
            den = deg[u] + deg[v] - cn
            out[(u, v)] = (cn, ra, cn, den, cn / den)
    return out


def test_scores_match_bruteforce(spark):
    from brontes_spark.operators.linkpred import link_prediction_scores

    # two triangles sharing a bridge, a hub, duplicate + reversed +
    # self-loop edges to exercise canonicalization
    edges = [
        (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6),
        (7, 1), (7, 2), (7, 3), (7, 4), (7, 5),  # hub 7
        (2, 1), (1, 1), (3, 2),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    want = _brute(edges)
    got = {
        (r["u"], r["v"]): (
            r["common_neighbors"], r["ra_12"], r["jaccard_num"],
            r["jaccard_den"], r["jaccard"],
        )
        for r in link_prediction_scores(df).collect()
    }
    assert got == want


def test_hub_cap_and_min_common(spark):
    from brontes_spark.operators.linkpred import link_prediction_scores

    edges = [
        (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6),
        (7, 1), (7, 2), (7, 3), (7, 4), (7, 5),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    want = _brute(edges, max_center_degree=4, min_common=2)
    got = {
        (r["u"], r["v"]): (
            r["common_neighbors"], r["ra_12"], r["jaccard_num"],
            r["jaccard_den"], r["jaccard"],
        )
        for r in link_prediction_scores(
            df, max_center_degree=4, min_common=2
        ).collect()
    }
    assert got == want
    # hub 7 (degree 5) must not appear as a center anywhere
    assert all(cn <= 4 for cn, *_ in got.values())
