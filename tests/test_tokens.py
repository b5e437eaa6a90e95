"""C12 missing-token discovery + backfill (sources/tokens.py): the batch
analog of brontes-core/src/missing_token_info.rs — quarantine report, dim
upsert, and re-classification exactness after backfill."""

from __future__ import annotations

from decimal import Decimal

import pytest

from brontes_spark.classify import classify_traces
from brontes_spark.sources.abi_decode import decode_traces
from brontes_spark.sources.tokens import (
    backfill_token_decimals,
    fetch_token_metadata,
    missing_token_report,
)

from .test_abi_decode import E18, _TRACE_DDL, _trace, _w_addr, _w_uint

DAI = "0x" + "aa" * 20
MYSTERY = "0x" + "ee" * 20  # 6-decimals token absent from the dim
BAL = "0xbal"


def _classified(spark, token_decimals):
    # Balancer V1 swap MYSTERY -> DAI: both tokens explicit in calldata
    cd = (
        "0x8201aa3f" + _w_addr(MYSTERY) + _w_uint(5 * 10**6) + _w_addr(DAI)
        + _w_uint(1) + _w_uint(2**100)
    )
    logs = [dict(address=BAL, topic0="0xls",
                 data_params={"token_amount_out": str(3 * E18)})]
    traces = decode_traces(
        spark.createDataFrame([_trace(1, "0xq1", 0, BAL, cd, logs)], _TRACE_DDL)
    )
    a2p = spark.createDataFrame(
        [(BAL, "BalancerV1")], "address string, protocol string"
    )
    binfo = spark.createDataFrame(
        [(1, "0xb")], "block_number long, beneficiary string"
    )
    return classify_traces(traces, a2p, token_decimals, binfo)


@pytest.mark.slow
def test_missing_token_quarantine_and_backfill(spark):
    dim = spark.createDataFrame([(DAI, 18)], "address string, decimals int")
    actions = _classified(spark, dim).cache()

    # quarantine: the unknown token surfaces, the known one does not;
    # in-flight scaling fell back to 18 decimals (C3 default) so the
    # 6-decimals amount is wrong by 10^12
    report = missing_token_report(actions, dim).collect()
    assert [r["token"] for r in report] == [MYSTERY]
    assert report[0]["n_refs"] == 1
    # 5e6 raw at the 18-dec default scales exactly to 5e-12 (the old
    # decimal-division _scaled rounded this to zero at 6dp) — still wrong
    # by 10^12 vs the true 6-dec amount; the backfill exists to fix that
    swap = actions.filter(actions.tx_hash == "0xq1").collect()[0]["swap"]
    assert swap["amount_in"] == Decimal("5E-12")

    # the eth_call boundary stays out of the engine
    with pytest.raises(NotImplementedError):
        fetch_token_metadata(spark.createDataFrame([(MYSTERY,)], "address string"))

    # backfill: resolved rows merge in; existing rows win over conflicts
    resolved = spark.createDataFrame(
        [(MYSTERY, 6), (DAI, 7)], "address string, decimals int"
    )
    enriched = backfill_token_decimals(dim, resolved)
    got = {r["address"]: r["decimals"] for r in enriched.collect()}
    assert got == {DAI: 18, MYSTERY: 6}

    # idempotent: backfilling the same resolution again changes nothing
    again = backfill_token_decimals(enriched, resolved)
    assert {r["address"]: r["decimals"] for r in again.collect()} == got

    # the re-run pass now scales the quarantined token exactly
    swap2 = _classified(spark, enriched).filter(
        "tx_hash = '0xq1'"
    ).collect()[0]["swap"]
    assert swap2["amount_in"] == Decimal(5)
    assert swap2["amount_out"] == Decimal(3)
    assert missing_token_report(_classified(spark, enriched), enriched).count() == 0


def test_mint_burn_collect_tokens_quarantined(spark):
    """A token referenced ONLY by mint/burn rows must reach the C12 report."""
    from decimal import Decimal

    import brontes_spark.schemas as S
    from brontes_spark.sources.tokens import missing_token_report

    row = {f.name: None for f in S.ACTIONS_SCHEMA.fields}
    row.update(
        block_number=1, tx_hash="0xa", tx_index=0, trace_idx=1,
        trace_address=[0], action_type="mint",
        mint_burn_collect={
            "from": "0xeoa", "recipient": "0xeoa", "pool": "0xpool",
            "tokens": ["0xmintonly", "0xknown"],
            "amounts": [Decimal("1000"), Decimal("2000")],
        },
    )
    actions = spark.createDataFrame([row], S.ACTIONS_SCHEMA)
    dims = spark.createDataFrame([("0xknown", 18)], "address string, decimals int")
    missing = [r["token"] for r in missing_token_report(actions, dims).collect()]
    assert missing == ["0xmintonly"]
