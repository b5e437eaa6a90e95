"""C2 landing pass tests: raw hex calldata → decoded struct → (for the
ERC20 path) all the way through classify_traces. Word layouts are built by
hand so the test is backend-independent (eth_abi or the pure-python
fallback)."""

from __future__ import annotations

from decimal import Decimal

from brontes_spark.sources.abi_decode import decode_calldata, decode_traces

E18 = 10**18
U2 = "0x" + "02" * 20
U3 = "0x" + "03" * 20


def _w_addr(a: str) -> str:
    return a[2:].rjust(64, "0")


def _w_uint(v: int) -> str:
    return format(v, "x").rjust(64, "0")


def _w_int(v: int) -> str:
    return format(v % (1 << 256), "x").rjust(64, "0")


def test_decode_transfer():
    cd = "0xa9059cbb" + _w_addr(U2) + _w_uint(100 * E18)
    fn, params = decode_calldata(cd)
    assert fn == "transfer"
    assert params == {"to": U2, "amount": str(100 * E18)}


def test_decode_transfer_from():
    cd = "0x23b872dd" + _w_addr(U2) + _w_addr(U3) + _w_uint(7)
    fn, params = decode_calldata(cd)
    assert fn == "transferFrom"
    assert params == {"from": U2, "to": U3, "amount": "7"}


def test_decode_v3_swap_negative_amount_and_dynamic_bytes():
    # swap(recipient, zeroForOne=true, amountSpecified=-5e18, limit, data=0xbeef)
    head = (
        _w_addr(U2)
        + _w_uint(1)
        + _w_int(-5 * E18)
        + _w_uint(123456)
        + _w_uint(5 * 32)  # offset of `data` past the 5-word head
    )
    tail = _w_uint(2) + "beef".ljust(64, "0")
    fn, params = decode_calldata("0x128acb08" + head + tail)
    assert fn == "swap"
    assert params["recipient"] == U2
    assert params["zero_for_one"] == "true"
    assert params["amount_specified"] == str(-5 * E18)
    assert params["sqrt_price_limit_x96"] == "123456"
    assert params["data"] == "0xbeef"


def test_decode_unknown_selector_and_garbage():
    assert decode_calldata("0xdeadbeef" + _w_uint(1)) is None
    assert decode_calldata(None) is None
    assert decode_calldata("0xa9059cbb" + "zz") is None
    assert decode_calldata("0xa9059cbb" + _w_addr(U2)) is None  # short


def test_landing_pass_feeds_classify(spark):
    """Raw traces with hex calldata only → decode_traces → classify_traces
    produces a correctly scaled transfer action (C2 + C3 end-to-end)."""
    from brontes_spark.classify import classify_traces

    ddl = (
        "block_number long, tx_hash string, tx_index long, trace_idx long, "
        "trace_address array<int>, action_kind string, call_type string, "
        "from_address string, to_address string, msg_sender string, "
        "msg_value string, calldata_selector string, calldata string, "
        "decoded struct<function:string, params:map<string,string>>, "
        "logs array<struct<address:string, topic0:string, data_params:map<string,string>>>, "
        "error string, is_success boolean"
    )
    cd = "0xa9059cbb" + _w_addr(U2) + _w_uint(100 * E18)
    rows = [
        dict(
            block_number=1, tx_hash="0xt", tx_index=0, trace_idx=0,
            trace_address=[], action_kind="call", call_type="call",
            from_address="0xu1", to_address="0xtok", msg_sender="0xu1",
            msg_value="0", calldata_selector=cd[:10], calldata=cd,
            decoded=None, logs=[], error=None, is_success=True,
        )
    ]
    traces = decode_traces(spark.createDataFrame(rows, ddl))
    a2p = spark.createDataFrame([], "address string, protocol string")
    tok = spark.createDataFrame([("0xtok", 6)], "address string, decimals int")
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    acts = classify_traces(traces, a2p, tok, binfo).collect()
    assert len(acts) == 1
    t = acts[0]["transfer"]
    # 100e18 raw at 6 decimals = 1e14
    assert t["amount"] == Decimal(100 * E18) / Decimal(10**6)
    assert t["to"] == U2 and t["token"] == "0xtok"
