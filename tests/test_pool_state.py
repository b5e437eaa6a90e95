"""G4 batch pool-state test: hand-computed UniV2 reserve evolution."""

from __future__ import annotations

from decimal import Decimal

import pytest

from brontes_spark.pricing.pool_state import univ2_pool_state
from brontes_spark.sources.fixtures import load_fixtures

D = Decimal


def test_univ2_reserve_evolution(spark):
    tables = load_fixtures(spark)
    init = spark.createDataFrame(
        [("0xpool2", D(10_000), D(100))],
        "pool string, r0 decimal(38,18), r1 decimal(38,18)",
    )
    state = {
        (r["block_number"], r["tx_index"], r["trace_idx"]): r.asDict()
        for r in univ2_pool_state(
            tables["actions"], tables["pools"], init
        ).filter("pool = '0xpool2' AND block_number = 102").collect()
    }
    # prior P2 flow: block 101 arb swap (B→A, −550 A +5 B) and long-tail
    # (−90 A +0.9 B) ⇒ block-102 opening reserves (9360, 105.9)
    # block 102 on P2: mint [1000,10] → victim swap 300A→2.8B → burn [1300,7.2]
    mint = state[(102, 0, 0)]
    assert mint["r0_pre"] == D(9_360) and mint["r0_post"] == D(10_360)
    assert mint["r1_pre"] == D("105.9") and mint["r1_post"] == D("115.9")
    swap = state[(102, 1, 0)]
    assert swap["r0_pre"] == D(10_360) and swap["r0_post"] == D(10_660)
    assert swap["r1_post"] == D("113.1")
    assert swap["spot_post"] == pytest.approx(113.1 / 10_660)
    burn = state[(102, 2, 0)]
    # JIT position fully unwound: reserves return to the block-102 opening
    assert burn["r0_post"] == D(9_360)
    assert burn["r1_post"] == D("105.9")
    assert burn["spot_post"] == pytest.approx(105.9 / 9_360)
