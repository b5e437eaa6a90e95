from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from brontes_spark.pricing.dex import realized_pool_prices, valid_pricing
from brontes_spark.sources.fixtures import load_fixtures


def test_realized_pool_prices(spark):
    actions = load_fixtures(spark)["actions"]
    prices = {
        (r["block_number"], r["tx_idx"]): r.asDict()
        for r in realized_pool_prices(actions)
        .filter((F.col("pool") == "0xpool1") & (F.col("token_in") == "0xtoka"))
        .collect()
    }
    # block 100: front swap 1000 A -> 10 B realized rate 0.01
    assert prices[(100, 0)]["post_state"] == pytest.approx(0.01)
    # victim v1 100 -> 0.9: pre carries the front's rate
    assert prices[(100, 1)]["pre_state"] == pytest.approx(0.01)
    assert prices[(100, 1)]["post_state"] == pytest.approx(0.009)
    assert not prices[(100, 1)]["drastic_move"]


def test_valid_pricing_filter(spark):
    priced = spark.createDataFrame(
        [
            ("0xa", Decimal(100), Decimal(1_000_000), 5),   # deep → kept though deviant
            ("0xb", Decimal(100), Decimal(10_000), 1),      # thin + deviant → dropped
            ("0xc", Decimal(1), Decimal(10_000), 1),        # thin but agrees → kept
            ("0xd", Decimal(7), Decimal(10_000), 1),        # no trusted price → kept
        ],
        "token string, price_usd decimal(38,18), pool_liquidity decimal(38,18), "
        "first_hop_connections int",
    )
    trusted = spark.createDataFrame(
        [("0xa", 1.0), ("0xb", 1.0), ("0xc", 1.0)], "token string, trusted_price double"
    )
    kept = {r["token"] for r in valid_pricing(priced, trusted).collect()}
    assert kept == {"0xa", "0xc", "0xd"}
