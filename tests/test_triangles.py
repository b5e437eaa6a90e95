"""Golden-graph tests for degree-ordered triangle counting
(operators/triangles.py): closed-form counts on K4, a star (zero), a
chorded ring, and robustness to direction/duplication/self-loops."""

from __future__ import annotations

from itertools import combinations

import pytest

from brontes_spark.operators.triangles import (
    canonical_edges,
    triangle_counts,
    triangle_total,
    triangles,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "s long, t long")


def test_k4_has_four_triangles(spark):
    e = _edges_df(spark, combinations(range(4), 2))
    tri = sorted(tuple(r) for r in triangles(e, "s", "t").collect())
    assert tri == [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    counts = {r["node"]: r["n_triangles"] for r in triangle_counts(e, "s", "t").collect()}
    # every K4 vertex sits in C(3,2) = 3 triangles
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}


def test_star_has_none(spark):
    # the celebrity-hub shape: center 0, leaves 1..9 — no closing edges
    e = _edges_df(spark, [(0, i) for i in range(1, 10)])
    assert triangles(e, "s", "t").count() == 0


def test_chorded_ring(spark):
    # ring 0..5 with +2 chords is the octahedron: the 6 consecutive
    # triangles (i, i+1, i+2) mod 6 PLUS the two chord 3-cycles
    # (0,2,4) and (1,3,5) — 8 total, every vertex in exactly 4
    n = 6
    pairs = [(i, (i + 1) % n) for i in range(n)] + [(i, (i + 2) % n) for i in range(n)]
    e = _edges_df(spark, pairs)
    got = sorted(tuple(r) for r in triangles(e, "s", "t").collect())
    assert (0, 2, 4) in got and (1, 3, 5) in got and len(got) == 8
    counts = {r["node"]: r["n_triangles"] for r in triangle_counts(e, "s", "t").collect()}
    assert counts == {i: 4 for i in range(n)}


def test_canonicalization_handles_dirt(spark):
    # duplicated, reversed, and self-looped input collapses to one K3
    e = _edges_df(spark, [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (1, 1), (0, 1)])
    ce = sorted(tuple(r) for r in canonical_edges(e, "s", "t").collect())
    assert ce == [(0, 1), (0, 2), (1, 2)]
    assert triangles(e, "s", "t").count() == 1


def test_triangle_total(spark):
    e = _edges_df(spark, combinations(range(4), 2))
    row = triangle_total(e, "s", "t").collect()[0]
    assert (row["n_triangles"], row["n_edges"]) == (4, 6)


@pytest.mark.parametrize("hub_degree", [50])
def test_hub_orientation_bounds_wedges(spark, hub_degree):
    # star + one leaf-leaf edge: exactly 1 triangle regardless of hub
    # degree; the orientation makes the hub's out-degree 0 so the wedge
    # relation stays O(1) instead of C(hub_degree, 2)
    pairs = [(0, i) for i in range(1, hub_degree + 1)] + [(1, 2)]
    e = _edges_df(spark, pairs)
    tri = [tuple(r) for r in triangles(e, "s", "t").collect()]
    assert tri == [(0, 1, 2)]
