"""C2 landing pass tests: raw hex calldata → decoded struct → (for the
ERC20 path) all the way through classify_traces. Word layouts are built by
hand so the test is backend-independent (eth_abi or the pure-python
fallback)."""

from __future__ import annotations

from decimal import Decimal

from brontes_spark.sources.abi_decode import decode_calldata, decode_traces
import pytest

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


@pytest.mark.slow
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


def test_derived_selectors_roundtrip():
    """functions/keccak: known vectors + the registered wide-protocol set."""
    from brontes_spark.functions.keccak import keccak256, selector, topic0

    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert selector("transfer(address,uint256)") == "0xa9059cbb"
    assert selector("exchange(int128,int128,uint256,uint256)") == "0x3df02124"
    assert selector("liquidationCall(address,address,address,uint256,bool)") == "0x00a718a9"
    assert topic0("Transfer(address,address,uint256)") == (
        "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    )


def test_decode_curve_exchange_and_liquidation_calldata():
    cd = "0x3df02124" + _w_int(0) + _w_int(1) + _w_uint(5 * E18) + _w_uint(4 * E18)
    fn, params = decode_calldata(cd)
    assert fn == "exchange"
    assert params == {"i": "0", "j": "1", "dx": str(5 * E18), "min_dy": str(4 * E18)}

    cd = (
        "0x00a718a9" + _w_addr(U2) + _w_addr(U3) + _w_addr("0x" + "04" * 20)
        + _w_uint(100 * E18) + _w_uint(0)
    )
    fn, params = decode_calldata(cd)
    assert fn == "liquidationCall"
    assert params["collateral_asset"] == U2 and params["debt_asset"] == U3
    assert params["receive_a_token"] == "false"


_TRACE_DDL = (
    "block_number long, tx_hash string, tx_index long, trace_idx long, "
    "trace_address array<int>, action_kind string, call_type string, "
    "from_address string, to_address string, msg_sender string, "
    "msg_value string, calldata_selector string, calldata string, "
    "decoded struct<function:string, params:map<string,string>>, "
    "logs array<struct<address:string, topic0:string, data_params:map<string,string>>>, "
    "error string, is_success boolean"
)


def _trace(bn, tx, idx, to, calldata, logs=None, sender="0xu1"):
    return dict(
        block_number=bn, tx_hash=tx, tx_index=0, trace_idx=idx,
        trace_address=[idx], action_kind="call", call_type="call",
        from_address=sender, to_address=to, msg_sender=sender,
        msg_value="0", calldata_selector=calldata[:10], calldata=calldata,
        decoded=None, logs=logs or [], error=None, is_success=True,
    )


@pytest.mark.slow
def test_wide_protocols_end_to_end(spark):
    """Curve exchange, Aave liquidation, MakerPSM sellGem, Balancer V1 swap:
    raw hex → decode_traces → classify_traces with the pool_coins dim."""
    from brontes_spark.classify import classify_traces

    CRV, AAVE, PSM, BAL = "0xcurvepool", "0xaavepool", "0xpsm", "0xbal"
    # ABI-encoded addresses must be real 20-byte hex
    DAI, USDC, WETH = "0x" + "aa" * 20, "0x" + "bb" * 20, "0x" + "cc" * 20

    curve_cd = "0x3df02124" + _w_int(0) + _w_int(1) + _w_uint(5 * E18) + _w_uint(1)
    curve_logs = [dict(address=CRV, topic0="0xte",
                       data_params={"tokens_bought": str(4_990_000)})]
    aave_cd = (
        "0x00a718a9" + _w_addr(WETH) + _w_addr(DAI) + _w_addr("0x" + "04" * 20)
        + _w_uint(100 * E18) + _w_uint(0)
    )
    aave_logs = [dict(address=AAVE, topic0="0xlc",
                      data_params={"liquidated_collateral_amount": str(2 * E18)})]
    psm_cd = "0x95991276" + _w_addr(U2) + _w_uint(7_000_000)  # sellGem 7 USDC
    bal_cd = (
        "0x8201aa3f" + _w_addr(WETH) + _w_uint(3 * E18) + _w_addr(DAI)
        + _w_uint(1) + _w_uint(2**100)
    )
    bal_logs = [dict(address=BAL, topic0="0xls",
                     data_params={"token_amount_out": str(6000 * E18)})]

    traces = decode_traces(spark.createDataFrame(
        [
            _trace(1, "0xt1", 0, CRV, curve_cd, curve_logs),
            _trace(1, "0xt2", 0, AAVE, aave_cd, aave_logs),
            _trace(1, "0xt3", 0, PSM, psm_cd),
            _trace(1, "0xt4", 0, BAL, bal_cd, bal_logs),
        ],
        _TRACE_DDL,
    ))
    a2p = spark.createDataFrame(
        [(CRV, "CurveBasePool2"), (AAVE, "AaveV3"), (PSM, "MakerPSM"),
         (BAL, "BalancerV1")],
        "address string, protocol string",
    )
    tok = spark.createDataFrame(
        [(DAI, 18), (USDC, 6), (WETH, 18)], "address string, decimals int"
    )
    coins = spark.createDataFrame(
        [(CRV, 0, DAI), (CRV, 1, USDC), (PSM, 0, DAI), (PSM, 1, USDC)],
        "pool string, idx int, token string",
    )
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    acts = {r["tx_hash"]: r for r in
            classify_traces(traces, a2p, tok, binfo, pool_coins=coins).collect()}

    crv = acts["0xt1"]["swap"]
    assert acts["0xt1"]["protocol"] == "CurveBasePool2"
    assert crv["token_in"] == DAI and crv["token_out"] == USDC
    assert crv["amount_in"] == Decimal(5)
    assert crv["amount_out"] == Decimal("4.99")  # log-realized, 6 decimals

    aave = acts["0xt2"]["liquidation"]
    assert acts["0xt2"]["action_type"] == "liquidation"
    assert aave["debt_asset"] == DAI and aave["collateral_asset"] == WETH
    assert aave["covered_debt"] == Decimal(100)
    assert aave["liquidated_collateral"] == Decimal(2)

    psm = acts["0xt3"]["swap"]
    assert psm["token_in"] == USDC and psm["token_out"] == DAI
    assert psm["amount_in"] == Decimal(7) and psm["amount_out"] == Decimal(7)

    bal = acts["0xt4"]["swap"]
    assert bal["token_in"] == WETH and bal["token_out"] == DAI
    assert bal["amount_in"] == Decimal(3) and bal["amount_out"] == Decimal(6000)


@pytest.mark.slow
def test_factory_discovery_from_raw_hex(spark):
    """C6 end-to-end from calldata: createPair on a dim-mapped factory +
    CREATE child trace → new_pool action with the factory's protocol."""
    from brontes_spark.classify import classify_traces

    FACT = "0xfactory"
    T0, T1 = "0x" + "aa" * 20, "0x" + "bb" * 20
    cd = "0xc9c65396" + _w_addr(T0) + _w_addr(T1)
    factory_call = _trace(1, "0xt9", 0, FACT, cd)
    child_create = dict(
        _trace(1, "0xt9", 1, "0xnewpair", "0x"),
        action_kind="create", trace_address=[0, 0], calldata_selector=None,
        calldata=None,
    )
    traces = decode_traces(spark.createDataFrame(
        [dict(factory_call, trace_address=[0]), child_create], _TRACE_DDL
    ))
    a2p = spark.createDataFrame(
        [(FACT, "UniswapV2")], "address string, protocol string"
    )
    tok = spark.createDataFrame([(T0, 18)], "address string, decimals int")
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    acts = classify_traces(traces, a2p, tok, binfo).collect()
    pools = [r for r in acts if r["action_type"] == "new_pool"]
    assert len(pools) == 1
    np = pools[0]
    assert np["protocol"] == "UniswapV2"
    assert np["mint_burn_collect"]["pool"] == "0xnewpair"
    assert np["mint_burn_collect"]["tokens"] == [T0, T1]


@pytest.mark.slow
def test_oneinch_aggregator_swap_from_logs(spark):
    """OneInchV5 router swap: nested executor calldata decodes to an empty
    param set; the normalized swap comes from the Swapped log."""
    from brontes_spark.classify import classify_traces

    ROUTER = "0x1111111254eeb25477b68fb85ed929f73a960582"
    SRC, DST = "0x" + "aa" * 20, "0x" + "bb" * 20
    cd = "0x12aa3caf" + _w_addr("0x" + "01" * 20)  # truncated payload is fine
    logs = [dict(address=ROUTER, topic0="0xsw", data_params={
        "src_token": SRC, "dst_token": DST,
        "spent_amount": str(5 * E18), "return_amount": str(9_000_000),
    })]
    traces = decode_traces(spark.createDataFrame(
        [_trace(1, "0xt10", 0, ROUTER, cd, logs)], _TRACE_DDL
    ))
    a2p = spark.createDataFrame(
        [(ROUTER, "OneInchV5")], "address string, protocol string"
    )
    tok = spark.createDataFrame(
        [(SRC, 18), (DST, 6)], "address string, decimals int"
    )
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    acts = classify_traces(traces, a2p, tok, binfo).collect()
    swaps = [r for r in acts if r["action_type"] == "swap"]
    assert len(swaps) == 1
    s = swaps[0]["swap"]
    assert swaps[0]["protocol"] == "OneInchV5"
    assert s["token_in"] == SRC and s["token_out"] == DST
    assert s["amount_in"] == Decimal(5)
    assert s["amount_out"] == Decimal(9)


@pytest.mark.slow
def test_new_protocol_families_end_to_end(spark):
    """BalancerV2 vault, Dodo sellBase, Cowswap settle, Clipper swap,
    ZeroX transformERC20, and a SushiSwapV2 alias: raw hex →
    decode_traces → classify_traces → normalized swaps."""
    from brontes_spark.classify import classify_traces
    from brontes_spark.functions.keccak import selector

    VAULT, DODO, COW, CLIP, ZRX, SUSHI = (
        "0xvault", "0xdodo", "0xcow", "0xclip", "0xzrx", "0xsushi"
    )
    DAI, USDC, WETH = "0x" + "aa" * 20, "0x" + "bb" * 20, "0x" + "cc" * 20
    POOL_ID = "0x" + "ee" * 20 + "0" * 24  # 32-byte poolId, pool = first 20

    bal_cd = selector(
        "swap((bytes32,uint8,address,address,uint256,bytes),"
        "(address,bool,address,bool),uint256,uint256)"
    ) + _w_uint(0) * 8
    bal_logs = [dict(address=VAULT, topic0="0xsw", data_params={
        "pool_id": POOL_ID, "token_in": WETH, "token_out": DAI,
        "amount_in": str(2 * E18), "amount_out": str(4000 * E18)})]

    dodo_cd = selector("sellBase(address)") + _w_addr(U2)
    dodo_logs = [dict(address=DODO, topic0="0xds", data_params={
        "from_token": WETH, "to_token": USDC,
        "from_amount": str(1 * E18), "to_amount": str(2_000_000_000)})]

    cow_cd = selector(
        "settle(address[],uint256[],(uint256,uint256,address,uint256,uint256,"
        "uint32,bytes32,uint256,uint256,uint256,bytes)[],(address,uint256,bytes)[][3])"
    ) + _w_uint(0) * 4
    cow_logs = [dict(address=COW, topic0="0xtr", data_params={
        "owner": U3, "sell_token": DAI, "buy_token": WETH,
        "sell_amount": str(4100 * E18), "buy_amount": str(2 * E18)})]

    clip_cd = selector(
        "swap(address,address,uint256,uint256,uint256,address,"
        "(uint8,bytes32,bytes32),bytes)"
    ) + _w_uint(0) * 8
    clip_logs = [dict(address=CLIP, topic0="0xcs", data_params={
        "in_asset": USDC, "out_asset": DAI, "recipient": U2,
        "in_amount": str(5_000_000), "out_amount": str(5 * E18)})]

    zrx_cd = (
        selector("transformERC20(address,address,uint256,uint256,(uint32,bytes)[])")
        + _w_addr(USDC) + _w_addr(WETH) + _w_uint(6_000_000) + _w_uint(1)
        + _w_uint(5 * 32)
    )
    zrx_logs = [dict(address=ZRX, topic0="0xtf", data_params={
        "output_token_amount": str(3 * 10**15)})]

    # SushiSwapV2 pair uses the UniswapV2 swap selector; decoded params come
    # from the landing pass param map (pre-decoded fixture convention)
    sushi_cd = "0x022c0d9f" + _w_uint(0) + _w_uint(0) + _w_addr(U2) + _w_uint(4 * 32)

    traces = decode_traces(spark.createDataFrame(
        [
            _trace(1, "0xb2", 0, VAULT, bal_cd, bal_logs),
            _trace(1, "0xdd", 0, DODO, dodo_cd, dodo_logs),
            _trace(1, "0xcw", 0, COW, cow_cd, cow_logs),
            _trace(1, "0xcl", 0, CLIP, clip_cd, clip_logs),
            _trace(1, "0xzx", 0, ZRX, zrx_cd, zrx_logs),
        ],
        _TRACE_DDL,
    ))
    a2p = spark.createDataFrame(
        [(VAULT, "BalancerV2"), (DODO, "Dodo"), (COW, "Cowswap"),
         (CLIP, "ClipperExchange"), (ZRX, "ZeroX"), (SUSHI, "SushiSwapV2")],
        "address string, protocol string",
    )
    tok = spark.createDataFrame(
        [(DAI, 18), (USDC, 6), (WETH, 18)], "address string, decimals int"
    )
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    acts = {r["tx_hash"]: r for r in
            classify_traces(traces, a2p, tok, binfo).collect()}

    b2 = acts["0xb2"]["swap"]
    assert acts["0xb2"]["protocol"] == "BalancerV2"
    assert b2["pool"] == "0x" + "ee" * 20  # first 20 bytes of poolId
    assert b2["token_in"] == WETH and b2["token_out"] == DAI
    assert b2["amount_in"] == Decimal(2) and b2["amount_out"] == Decimal(4000)

    dd = acts["0xdd"]["swap"]
    assert dd["token_in"] == WETH and dd["token_out"] == USDC
    assert dd["amount_in"] == Decimal(1) and dd["amount_out"] == Decimal(2000)
    assert dd["recipient"] == U2

    cw = acts["0xcw"]["swap"]
    assert cw["from"] == U3 and cw["token_in"] == DAI
    assert cw["amount_in"] == Decimal(4100) and cw["amount_out"] == Decimal(2)

    cl = acts["0xcl"]["swap"]
    assert cl["token_in"] == USDC and cl["amount_in"] == Decimal(5)
    assert cl["amount_out"] == Decimal(5) and cl["recipient"] == U2

    zx = acts["0xzx"]["swap"]
    assert zx["token_in"] == USDC and zx["token_out"] == WETH
    assert zx["amount_in"] == Decimal(6)
    assert zx["amount_out"] == Decimal("0.003")  # log-realized


@pytest.mark.slow
def test_uniswapx_fill_end_to_end(spark):
    from brontes_spark.classify import classify_traces
    from brontes_spark.functions.keccak import selector

    RX = "0xreactor"
    DAI, WETH = "0x" + "aa" * 20, "0x" + "cc" * 20
    cd = selector("execute((bytes,bytes))") + _w_uint(32) * 2
    logs = [dict(address=RX, topic0="0xfl", data_params={
        "swapper": U3, "token_in": WETH, "token_out": DAI,
        "amount_in": str(1 * E18), "amount_out": str(2000 * E18)})]
    traces = decode_traces(spark.createDataFrame(
        [_trace(1, "0xux", 0, RX, cd, logs)], _TRACE_DDL
    ))
    a2p = spark.createDataFrame([(RX, "UniswapX")], "address string, protocol string")
    tok = spark.createDataFrame([(DAI, 18), (WETH, 18)], "address string, decimals int")
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    acts = classify_traces(traces, a2p, tok, binfo).collect()
    assert len(acts) == 1
    s = acts[0]["swap"]
    assert s["from"] == U3 and s["token_in"] == WETH
    assert s["amount_in"] == Decimal(1) and s["amount_out"] == Decimal(2000)


def _w_dynarr(vals: list[str], kind: str) -> str:
    """ABI-encode a dynamic array tail: length word + items."""
    out = _w_uint(len(vals))
    for v in vals:
        out += _w_addr(v) if kind == "address" else _w_uint(int(v))
    return out


def test_flash_loan_end_to_end(spark):
    """Aave multi-asset flashLoan + Maker DssFlash single-asset flash mint:
    raw hex (dynamic arrays) → flash_loan actions with per-asset scaling;
    the row carries metadata only (no deltas — flashloan.rs:38-44)."""
    from brontes_spark.classify import classify_traces
    from brontes_spark.functions.keccak import selector

    AAVE, MKR = "0xaavepool", "0xdssflash"
    DAI, USDC = "0x" + "aa" * 20, "0x" + "bb" * 20
    RECV = "0x" + "05" * 20

    # flashLoan(receiver, assets[], amounts[], modes[], onBehalfOf, params, code)
    # head: 7 words; tails at offsets
    h = 7 * 32
    assets_tail = _w_dynarr([DAI, USDC], "address")
    amounts_tail = _w_dynarr([str(1000 * E18), str(2_000_000)], "uint")
    modes_tail = _w_dynarr(["0", "0"], "uint")
    params_tail = _w_uint(0)
    aave_cd = (
        selector("flashLoan(address,address[],uint256[],uint256[],address,bytes,uint16)")
        + _w_addr(RECV)
        + _w_uint(h)                                     # assets offset
        + _w_uint(h + len(assets_tail) // 2)             # amounts offset
        + _w_uint(h + (len(assets_tail) + len(amounts_tail)) // 2)  # modes
        + _w_addr(U2)
        + _w_uint(h + (len(assets_tail) + len(amounts_tail) + len(modes_tail)) // 2)
        + _w_uint(0)
        + assets_tail + amounts_tail + modes_tail + params_tail
    )
    mkr_cd = (
        selector("flashLoan(address,address,uint256,bytes)")
        + _w_addr(RECV) + _w_addr(DAI) + _w_uint(5000 * E18) + _w_uint(4 * 32)
        + _w_uint(0)
    )
    traces = decode_traces(spark.createDataFrame(
        [
            _trace(1, "0xfa", 0, AAVE, aave_cd),
            _trace(1, "0xfm", 0, MKR, mkr_cd),
        ],
        _TRACE_DDL,
    ))
    a2p = spark.createDataFrame(
        [(AAVE, "AaveV3"), (MKR, "MakerDssFlash")], "address string, protocol string"
    )
    tok = spark.createDataFrame(
        [(DAI, 18), (USDC, 6)], "address string, decimals int"
    )
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    acts = {r["tx_hash"]: r for r in
            classify_traces(traces, a2p, tok, binfo).collect()}

    fa = acts["0xfa"]
    assert fa["action_type"] == "flash_loan" and fa["protocol"] == "AaveV3"
    fl = fa["flash_loan"]
    assert fl["receiver_contract"] == RECV
    assert fl["assets"] == [DAI, USDC]
    assert fl["amounts"] == [Decimal(1000), Decimal(2)]  # per-asset decimals

    fm = acts["0xfm"]["flash_loan"]
    assert fm["assets"] == [DAI] and fm["amounts"] == [Decimal(5000)]
    assert fm["pool"] == MKR


@pytest.mark.slow
def test_selfdestruct_pool_update_unclassified(spark):
    """Action-enum completeness: selfdestruct frames, pool re-init as
    pool_config_update, and opt-in unclassified passthrough."""
    from brontes_spark.classify import classify_traces

    FACT = "0xfactory"
    T0, T1 = "0x" + "aa" * 20, "0x" + "bb" * 20
    cd = "0xc9c65396" + _w_addr(T0) + _w_addr(T1)
    rows = [
        dict(_trace(1, "0xt1", 0, FACT, cd), trace_address=[0]),
        dict(
            _trace(1, "0xt1", 1, "0xknownpool", "0x"),
            action_kind="create", trace_address=[0, 0],
            calldata_selector=None, calldata=None,
        ),
        dict(
            _trace(1, "0xt2", 0, "0xrefund", "0x"),
            action_kind="selfdestruct", calldata_selector=None, calldata=None,
            msg_value=str(3 * E18),
        ),
        # a call no classifier claims
        dict(_trace(1, "0xt3", 0, "0xmystery", "0xdeadbeef" + _w_uint(0))),
    ]
    traces = decode_traces(spark.createDataFrame(rows, _TRACE_DDL))
    a2p = spark.createDataFrame(
        [(FACT, "UniswapV2"), ("0xknownpool", "UniswapV2")],
        "address string, protocol string",
    )
    tok = spark.createDataFrame([(T0, 18)], "address string, decimals int")
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")

    acts = classify_traces(traces, a2p, tok, binfo, include_unclassified=True).collect()
    by_type = {}
    for r in acts:
        by_type.setdefault(r["action_type"], []).append(r)

    # the created address is already dim-known → config update, not new_pool
    assert "pool_config_update" in by_type and "new_pool" not in by_type
    sd = by_type["self_destruct"][0]["transfer"]
    assert sd["to"] == "0xrefund" and sd["amount"] == Decimal(3)
    un = by_type["unclassified"]
    assert {r["tx_hash"] for r in un} >= {"0xt3"}
    # default mode stays quiet
    quiet = classify_traces(traces, a2p, tok, binfo).collect()
    assert all(r["action_type"] != "unclassified" for r in quiet)


def test_curve_and_dodo_factory_discovery(spark):
    """C6 over the widened factory surface: Curve deploy_plain_pool with an
    inline address[4] coin list (zero-padded) and a Dodo vending-machine
    factory, both from raw hex."""
    from brontes_spark.classify import classify_traces
    from brontes_spark.functions.keccak import selector

    CRVF, DVMF = "0xcrvfactory", "0xdvmfactory"
    T0, T1 = "0x" + "aa" * 20, "0x" + "bb" * 20
    ZERO = "0x" + "00" * 20

    # head: name_off, symbol_off, 4 inline coins, A, fee = 8 words
    h = 8 * 32
    name_tail = _w_uint(3) + "616263".ljust(64, "0")      # "abc"
    crv_cd = (
        selector("deploy_plain_pool(string,string,address[4],uint256,uint256)")
        + _w_uint(h) + _w_uint(h + len(name_tail) // 2)
        + _w_addr(T0) + _w_addr(T1) + _w_addr(ZERO) + _w_addr(ZERO)
        + _w_uint(100) + _w_uint(4000000)
        + name_tail + name_tail
    )
    dvm_cd = (
        selector("createDODOVendingMachine(address,address,uint256,uint256,uint256,bool)")
        + _w_addr(T0) + _w_addr(T1) + _w_uint(1) + _w_uint(2) + _w_uint(3) + _w_uint(0)
    )
    rows = [
        dict(_trace(1, "0xc1", 0, CRVF, crv_cd), trace_address=[0]),
        dict(
            _trace(1, "0xc1", 1, "0xnewcrv", "0x"),
            action_kind="create", trace_address=[0, 0],
            calldata_selector=None, calldata=None,
        ),
        dict(_trace(1, "0xd1", 0, DVMF, dvm_cd), trace_address=[0]),
        dict(
            _trace(1, "0xd1", 1, "0xnewdvm", "0x"),
            action_kind="create", trace_address=[0, 0],
            calldata_selector=None, calldata=None,
        ),
    ]
    traces = decode_traces(spark.createDataFrame(rows, _TRACE_DDL))
    a2p = spark.createDataFrame(
        [(CRVF, "CurveV2PlainPool"), (DVMF, "Dodo")], "address string, protocol string"
    )
    tok = spark.createDataFrame([(T0, 18)], "address string, decimals int")
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    pools = {
        r["mint_burn_collect"]["pool"]: r
        for r in classify_traces(traces, a2p, tok, binfo).collect()
        if r["action_type"] == "new_pool"
    }
    crv = pools["0xnewcrv"]
    assert crv["protocol"] == "CurveV2PlainPool"
    assert crv["mint_burn_collect"]["tokens"] == [T0, T1]  # zero coins pruned
    dvm = pools["0xnewdvm"]
    assert dvm["protocol"] == "Dodo"
    assert dvm["mint_burn_collect"]["tokens"] == [T0, T1]


def test_balancer_crp_routes_via_v1_decoder(spark):
    """BalancerV1CRP (protocol.rs:77, the V1 SmartPool proxy) shares the
    core BPool swap interface, so a CRP-tagged address must route through
    the BalancerV1 swapExactAmountIn decoder."""
    from brontes_spark.classify import classify_traces

    CRP = "0xcrp"
    DAI, WETH = "0x" + "aa" * 20, "0x" + "cc" * 20
    cd = (
        "0x8201aa3f" + _w_addr(WETH) + _w_uint(3 * E18) + _w_addr(DAI)
        + _w_uint(1) + _w_uint(2**100)
    )
    logs = [dict(address=CRP, topic0="0xls",
                 data_params={"token_amount_out": str(6000 * E18)})]
    traces = decode_traces(
        spark.createDataFrame([_trace(1, "0xcrp1", 0, CRP, cd, logs)], _TRACE_DDL)
    )
    a2p = spark.createDataFrame(
        [(CRP, "BalancerV1CRP")], "address string, protocol string"
    )
    tok = spark.createDataFrame(
        [(DAI, 18), (WETH, 18)], "address string, decimals int"
    )
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    acts = {r["tx_hash"]: r for r in classify_traces(traces, a2p, tok, binfo).collect()}
    crp = acts["0xcrp1"]["swap"]
    assert acts["0xcrp1"]["protocol"] == "BalancerV1CRP"
    assert crp["token_in"] == WETH and crp["token_out"] == DAI
    assert crp["amount_in"] == Decimal(3) and crp["amount_out"] == Decimal(6000)


@pytest.mark.slow
def test_uniswap_family_raw_swaps_end_to_end(spark):
    """UniswapV2/V3 pool swaps + V3 mint from RAW calldata/logs: the pool
    calldata names no tokens (V2: amountOut pair; V3: zero_for_one/
    amount_specified), so tokens resolve via the pool-coins dim and amounts
    via the Swap/Mint event — the reference's exact sourcing. This was the
    one protocol family with no raw-path test (decoded params stayed null)."""
    from decimal import Decimal

    from brontes_spark.classify import classify_traces

    V2, V3 = "0x" + "22" * 20, "0x" + "33" * 20
    DAI, WETH = "0x" + "aa" * 20, "0x" + "cc" * 20
    U2 = "0x" + "ee" * 20

    # V2 swap(amount0Out=0, amount1Out=2e18, to, data) + Swap log
    v2_cd = "0x022c0d9f" + _w_uint(0) + _w_uint(2 * 10**18) + _w_addr(U2) + _w_uint(4 * 32)
    v2_logs = [dict(address=V2, topic0="0xswap", data_params={
        "amount0_in": str(4000 * 10**18), "amount1_in": "0",
        "amount0_out": "0", "amount1_out": str(2 * 10**18)})]

    # V3 swap(recipient, zero_for_one=false, amount_specified=+1e18 (exact-in
    # token1), limit, data) — NO log: calldata-only fallback
    v3_cd = ("0x128acb08" + _w_addr(U2) + _w_uint(0) + _w_uint(10**18)
             + _w_uint(0) + _w_uint(5 * 32))
    # zero_for_one=false word: _w_uint(0) = false

    # V3 mint(recipient, tickLower, tickUpper, liquidity, data) + Mint log
    v3_mint_cd = ("0x3c8a7d8d" + _w_addr(U2) + _w_int(-60) + _w_int(60)
                  + _w_uint(10**12) + _w_uint(5 * 32))
    v3_mint_logs = [dict(address=V3, topic0="0xmint", data_params={
        "amount0": str(3000 * 10**18), "amount1": str(1 * 10**18)})]

    traces = decode_traces(spark.createDataFrame(
        [
            _trace(1, "0xv2s", 0, V2, v2_cd, v2_logs),
            _trace(1, "0xv3s", 0, V3, v3_cd),
            _trace(1, "0xv3m", 0, V3, v3_mint_cd, v3_mint_logs),
        ],
        _TRACE_DDL,
    ))
    a2p = spark.createDataFrame(
        [(V2, "UniswapV2"), (V3, "UniswapV3")], "address string, protocol string"
    )
    coins = spark.createDataFrame(
        [(V2, 0, DAI), (V2, 1, WETH), (V3, 0, DAI), (V3, 1, WETH)],
        "pool string, idx int, token string",
    )
    tok = spark.createDataFrame([(DAI, 18), (WETH, 18)], "address string, decimals int")
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    acts = {r["tx_hash"]: r for r in
            classify_traces(traces, a2p, tok, binfo, pool_coins=coins).collect()}

    v2s = acts["0xv2s"]["swap"]
    assert acts["0xv2s"]["action_type"] == "swap"
    assert v2s["token_in"] == DAI and v2s["token_out"] == WETH
    assert v2s["amount_in"] == Decimal(4000) and v2s["amount_out"] == Decimal(2)
    assert v2s["pool"] == V2 and v2s["recipient"] == U2

    v3s = acts["0xv3s"]["swap"]
    # zero_for_one=false, exact-in 1e18: token1 (WETH) in, token0 (DAI) out
    assert v3s["token_in"] == WETH and v3s["token_out"] == DAI
    assert v3s["amount_in"] == Decimal(1)
    assert v3s["amount_out"] is None  # no Swap log: out unknown from calldata

    v3m = acts["0xv3m"]["mint_burn_collect"]
    assert acts["0xv3m"]["action_type"] == "mint"
    assert v3m["tokens"] == [DAI, WETH]
    assert v3m["amounts"] == [Decimal(3000), Decimal(1)]
    assert v3m["recipient"] == U2


def test_curve_exchange_underlying_metapool_indices(spark):
    """exchange_underlying's i/j address the UNDERLYING list (metapool base
    expansion, landed at idx 100+i), never the pool's own 2-coin list — the
    old resolution returned the base-LP token for j=1 (wrong asset)."""
    from decimal import Decimal

    from brontes_spark.classify import classify_traces
    from brontes_spark.functions.keccak import selector

    META = "0x" + "77" * 20
    FRAX, LP3, DAI, USDC = ("0x" + c * 20 for c in ("f1", "3c", "aa", "bb"))
    cd = (selector("exchange_underlying(int128,int128,uint256,uint256)")
          + _w_int(0) + _w_int(2) + _w_uint(7 * 10**18) + _w_uint(0))
    logs = [dict(address=META, topic0="0xte",
                 data_params={"tokens_bought": str(6_900_000)})]
    traces = decode_traces(spark.createDataFrame(
        [_trace(1, "0xeu", 0, META, cd, logs)], _TRACE_DDL))
    a2p = spark.createDataFrame([(META, "CurveV1MetaPool")],
                                "address string, protocol string")
    # own coins: [FRAX, 3CRV-LP]; underlying: [FRAX, DAI, USDC] at 100+
    coins = spark.createDataFrame(
        [(META, 0, FRAX), (META, 1, LP3),
         (META, 100, FRAX), (META, 101, DAI), (META, 102, USDC)],
        "pool string, idx int, token string",
    )
    tok = spark.createDataFrame(
        [(FRAX, 18), (DAI, 18), (USDC, 6)], "address string, decimals int"
    )
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    acts = classify_traces(traces, a2p, tok, binfo, pool_coins=coins).collect()
    sw = {r["tx_hash"]: r["swap"] for r in acts}["0xeu"]
    assert sw["token_in"] == FRAX and sw["token_out"] == USDC  # NOT the LP token
    assert sw["amount_in"] == Decimal(7)
    assert sw["amount_out"] == Decimal("6.9")  # 6dp USDC from the log


def test_curve_v2_metapool_exchange_lp_token_golden(spark):
    """Golden for the reference's CurveV2MetapoolImpl exchange decode cases
    (classifiers/curve/swaps/v2_meta.rs:7-103): sold_id/bought_id are a
    2-entry space where 0 => token0 and 1 => the CURVE LP TOKEN of the base
    pool — i.e. the pool's own coin list [coin0, base-LP], a DIFFERENT space
    from exchange_underlying's expanded list. Also pins the realized-amount
    source: TokenExchange log tokens_bought when present, calldata min_dy
    floor when the log is missing (the log:true fallible path)."""
    from decimal import Decimal

    from brontes_spark.classify import classify_traces
    from brontes_spark.functions.keccak import selector

    META = "0x" + "88" * 20
    CRVUSD, LP3, DAI, USDC = ("0x" + c * 20 for c in ("c1", "3c", "aa", "bb"))
    ex = selector("exchange(int128,int128,uint256,uint256)")
    # sell 4 LP (i=1) for coin0 (j=0); log reports 3.97e18 bought
    cd_logged = ex + _w_int(1) + _w_int(0) + _w_uint(4 * 10**18) + _w_uint(3 * 10**18)
    logs = [dict(address=META, topic0="0xte",
                 data_params={"tokens_bought": str(3_970_000_000_000_000_000)})]
    # same call shape with NO TokenExchange log -> min_dy floor
    cd_floor = ex + _w_int(1) + _w_int(0) + _w_uint(4 * 10**18) + _w_uint(3 * 10**18)

    traces = decode_traces(spark.createDataFrame(
        [_trace(1, "0xlp", 0, META, cd_logged, logs),
         _trace(1, "0xfl", 0, META, cd_floor)], _TRACE_DDL))
    a2p = spark.createDataFrame([(META, "CurveV2MetapoolImpl")],
                                "address string, protocol string")
    # own coins: [crvUSD, 3CRV-LP]; underlying expansion present too and
    # MUST NOT be consulted by plain exchange
    coins = spark.createDataFrame(
        [(META, 0, CRVUSD), (META, 1, LP3),
         (META, 100, CRVUSD), (META, 101, DAI), (META, 102, USDC)],
        "pool string, idx int, token string",
    )
    tok = spark.createDataFrame(
        [(CRVUSD, 18), (LP3, 18), (DAI, 18), (USDC, 6)],
        "address string, decimals int",
    )
    binfo = spark.createDataFrame([(1, "0xb")], "block_number long, beneficiary string")
    acts = {r["tx_hash"]: r for r in
            classify_traces(traces, a2p, tok, binfo, pool_coins=coins).collect()}

    sw = acts["0xlp"]["swap"]
    assert acts["0xlp"]["protocol"] == "CurveV2MetapoolImpl"
    assert sw["token_in"] == LP3      # v2_meta.rs: 1 => curve_lp_token
    assert sw["token_out"] == CRVUSD  # v2_meta.rs: 0 => token0
    assert sw["amount_in"] == Decimal(4)
    assert sw["amount_out"] == Decimal("3.97")  # log-realized

    fl = acts["0xfl"]["swap"]
    assert fl["token_in"] == LP3 and fl["token_out"] == CRVUSD
    assert fl["amount_out"] == Decimal(3)  # min_dy floor when log missing
