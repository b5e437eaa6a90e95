"""S5 config load: TOML → dimension DataFrames (sources/config.py), with a
self-contained fixture config in the reference's file shapes."""

from __future__ import annotations

from brontes_spark.sources.config import (
    load_builder_config,
    load_classifier_config,
    load_metadata_config,
    load_searcher_config,
)

_CLS = """
[MakerPSM."0x89B78CfA322F6C5dE0aBcEecab66Aee45393cC5A"]
init_block = 11478006

[[MakerPSM."0x89B78CfA322F6C5dE0aBcEecab66Aee45393cC5A".token_info]]
address = "0x6B175474E89094C44Da98b954EedeAC495271d0F"
decimals = 18
symbol = "DAI"

[[MakerPSM."0x89B78CfA322F6C5dE0aBcEecab66Aee45393cC5A".token_info]]
address = "0xA0b86991c6218b36c1d19D4a2e9Eb0cE3606eB48"
decimals = 6
symbol = "USDC"

[AaveV3."0x5faab9e1adbddad0a08734be8a52185fd6558e14"]
init_block = 18979624

[CurveV1MetaPool."0xMETA"]
init_block = 1

[[CurveV1MetaPool."0xMETA".token_info]]
address = "0xFRAX"
decimals = 18

[[CurveV1MetaPool."0xMETA".token_info]]
address = "0x3LP"
decimals = 18

[[CurveV1MetaPool."0xMETA".underlying_token_info]]
address = "0xFRAX"
decimals = 18

[[CurveV1MetaPool."0xMETA".underlying_token_info]]
address = "0xDAI"
decimals = 18
"""

_SEARCHER = """
[searcher_eoas."0x0cac3d1a887206e0f6169222C4504301A8b4b993"]
fund = "Fund A"
builder = "0x95222290DD7278Aa3Ddd389Cc1E1d165CC4BAfe5"

[searcher_contracts."0xFA103c21ea2DF71DFb92B0652F8B1D795e51cdEf"]
fund = "Fund A"
"""

_BUILDER = """
[builders."0x95222290DD7278Aa3Ddd389Cc1E1d165CC4BAfe5"]
name = "beaverbuild"
fund = "Fund A"
pub_keys = ["0xAB"]
searchers_eoas = ["0x0cac3d1a887206e0f6169222C4504301A8b4b993"]
searchers_contracts = []
"""

_META = """
[metadata."0x111111125421cA6dc452d289314280a0f8842A65"]
entity_name = "1inch"
nametag = "1inch v6: Aggregation Router"
labels = ["DEX"]
address_type = "dex-aggregator"

[metadata."0x111111125421cA6dc452d289314280a0f8842A65".contract_info]
verified_contract = true
"""


def test_classifier_config_dims(spark, tmp_path):
    p = tmp_path / "classifier_config.toml"
    p.write_text(_CLS)
    a2p, toks, coins = load_classifier_config(spark, str(p))
    a2p_rows = {r["address"]: r for r in a2p.collect()}
    psm = "0x89b78cfa322f6c5de0abceecab66aee45393cc5a"
    assert a2p_rows[psm]["protocol"] == "MakerPSM"
    assert a2p_rows[psm]["init_block"] == 11478006
    assert a2p_rows["0x5faab9e1adbddad0a08734be8a52185fd6558e14"]["protocol"] == "AaveV3"
    tok_rows = {r["address"]: r for r in toks.collect()}
    assert tok_rows["0x6b175474e89094c44da98b954eedeac495271d0f"]["decimals"] == 18
    coin_rows = {(r["pool"], r["idx"]): r["token"] for r in coins.collect()}
    # token_info order IS the coin index (dai=0, gem=1 for the PSM decoder)
    assert coin_rows[(psm, 0)].endswith("495271d0f")
    assert coin_rows[(psm, 1)].endswith("3606eb48")
    # underlying_token_info lands in the exchange_underlying index space
    # (classify.UNDERLYING_IDX + i), separate from the pool's own coins
    meta = "0xmeta"
    assert coin_rows[(meta, 0)] == "0xfrax" and coin_rows[(meta, 1)] == "0x3lp"
    assert coin_rows[(meta, 100)] == "0xfrax" and coin_rows[(meta, 101)] == "0xdai"


def test_searcher_builder_metadata_configs(spark, tmp_path):
    sp = tmp_path / "searcher.toml"; sp.write_text(_SEARCHER)
    bp = tmp_path / "builder.toml"; bp.write_text(_BUILDER)
    mp = tmp_path / "meta.toml"; mp.write_text(_META)

    s = {(r["address"], r["kind"]): r for r in load_searcher_config(spark, str(sp)).collect()}
    eoa = s[("0x0cac3d1a887206e0f6169222c4504301a8b4b993", "eoa")]
    assert eoa["fund"] == "Fund A"
    assert eoa["builder"] == "0x95222290dd7278aa3ddd389cc1e1d165cc4bafe5"
    assert ("0xfa103c21ea2df71dfb92b0652f8b1d795e51cdef", "contract") in s

    b = load_builder_config(spark, str(bp)).collect()
    assert len(b) == 1 and b[0]["name"] == "beaverbuild"
    assert b[0]["searchers_eoas"] == ["0x0cac3d1a887206e0f6169222c4504301a8b4b993"]

    m = load_metadata_config(spark, str(mp)).collect()
    assert m[0]["entity_name"] == "1inch" and m[0]["verified_contract"] is True
