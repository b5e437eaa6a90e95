"""Unit tests for the CEX quote operators (X1-X3, X5, X6) and the token
graph (G1-G3) on hand-built frames."""

from __future__ import annotations

from decimal import Decimal

import pytest

from brontes_spark.operators.cex_quotes import (
    fee_adjusted,
    intermediary_price,
    most_liquid_quote,
    optimistic_vwap,
    quote_at,
)
from brontes_spark.pricing.graph import TokenGraph, prune_low_liquidity

D = Decimal

QUOTES_DDL = (
    "exchange string, base_token string, quote_token string, timestamp long, "
    "ask_price decimal(38,18), bid_price decimal(38,18)"
)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("binance", "A", "USD", 1_000_000, D("1.02"), D("1.00")),
        ("binance", "A", "USD", 2_000_000, D("1.04"), D("1.02")),
        ("okex", "A", "USD", 2_500_000, D("1.10"), D("1.08")),
    ]
    return spark.createDataFrame(rows, QUOTES_DDL)


def test_x1_quote_at(spark, quotes):
    targets = spark.createDataFrame(
        [(1, "A", "USD", 2_400_000), (2, "A", "USD", 900_000), (3, "A", "USD", 9_000_000)],
        "target_id long, base_token string, quote_token string, ts long",
    )
    out = {r["target_id"]: r.asDict() for r in
           quote_at(targets, quotes, "binance", max_time_diff_us=1_000_000).collect()}
    assert out[1]["ask_price"] == D("1.04")      # latest at-or-before within 1s
    assert out[2]["ask_price"] is None           # no quote at-or-before ts
    assert out[3]["ask_price"] is None           # stale (>1s old)


def test_x2_most_liquid(spark, quotes):
    targets = spark.createDataFrame(
        [(1, "A", "USD", 2_600_000)],
        "target_id long, base_token string, quote_token string, ts long",
    )
    rank = spark.createDataFrame(
        [("A", "USD", "okex", 1), ("A", "USD", "binance", 2)],
        "base_token string, quote_token string, exchange string, rank int",
    )
    out = most_liquid_quote(targets, quotes, rank).collect()
    assert len(out) == 1 and out[0]["rank"] == 1 and out[0]["ask_price"] == D("1.10")


def test_x3_fee_adjusted(spark, quotes):
    targets = spark.createDataFrame(
        [(1, "A", "USD", 2_400_000)],
        "target_id long, base_token string, quote_token string, ts long",
    )
    quoted = quote_at(targets, quotes, "binance").withColumn(
        "exchange", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("binance")
    )
    fees = spark.createDataFrame(
        [("binance", D("0.001"), D("0.002"))],
        "exchange string, maker_fee decimal(18,9), taker_fee decimal(18,9)",
    )
    r = fee_adjusted(quoted, fees).collect()[0]
    assert r["price_maker"] == D("1.02897")  # 1.03 * 0.999
    assert r["price_taker"] == D("1.02794")  # 1.03 * 0.998


def test_x5_intermediary(spark):
    legs = spark.createDataFrame(
        [("A", "X", D(2)), ("X", "B", D(3)), ("A", "Y", D(1))],
        "base_token string, quote_token string, price decimal(38,18)",
    )
    out = intermediary_price(legs).collect()
    assert len(out) == 1
    assert out[0]["from_token"] == "A" and out[0]["to_token"] == "B"
    assert out[0]["price"] == D(6)


def test_x6_optimistic(spark):
    anchors = spark.createDataFrame(
        [("a", "k", 1_000_000, D(100))],
        "anchor_id string, key string, anchor_ts long, required_vol decimal(38,18)",
    )
    ticks = spark.createDataFrame(
        [
            ("k", 1_100_000, D("1.10"), D(80), 1),   # pricey — should be skipped
            ("k", 900_000, D("1.00"), D(60), 2),     # cheapest, taken first
            ("k", 1_050_000, D("1.05"), D(60), 3),   # second cheapest, covers
            ("k", 99, D("0.10"), D(1000), 4),        # outside the window
        ],
        "key string, tick_ts long, price decimal(38,18), vol decimal(38,18), tick_id long",
    )
    out = optimistic_vwap(anchors, ticks, window_us=500_000).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_trades"] == 2
    assert r["optimistic_price"] == pytest.approx((60 * 1.00 + 60 * 1.05) / 120)


def test_graph_paths_and_pruning(spark):
    pools = spark.createDataFrame(
        [
            ("p1", "A", "B", 100_000.0),
            ("p2", "B", "C", 100_000.0),
            ("p3", "A", "C", 1_000.0),   # below liquidity floor
        ],
        "pool string, token0 string, token1 string, liquidity_usd double",
    )
    pruned = prune_low_liquidity(pools)
    assert pruned.count() == 2
    g = TokenGraph.from_pools(pruned)
    assert g.shortest_path("A", "C") == ["p1", "p2"]
    assert g.shortest_path("A", "Z") is None
    full = TokenGraph.from_pools(pools)
    assert full.shortest_path("A", "C") == ["p3"]  # direct edge when unpruned
    ks = full.k_shortest_paths("A", "C", k=2)
    assert ks == [["p3"], ["p1", "p2"]]
