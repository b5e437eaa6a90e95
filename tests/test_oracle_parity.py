"""Replicates the driver's t2 correctness gate at sf0.01 — the SAME scale the
driver checks — for every registered query: Spark result vs DuckDB oracle,
order-insensitive, bit-exact doubles (see brontes_spark/functions/decimals.py
for why that is achievable) and driver-strict dtype checking (oracle.py)."""

from __future__ import annotations

import os

import pytest

from brontes_spark.plans import REGISTRY

from .oracle import compare, duck_con

NAMES = sorted(REGISTRY)

PARITY_SF_DIR = os.environ.get(
    "SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01"
)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.fixture(scope="module")
def sf_dir():  # override conftest session default (sf0.001) for this module
    return PARITY_SF_DIR


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, sf_dir, con):
    spec = REGISTRY[name]
    df = spec.build(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's weak gate
        return
    ok, msg = compare(df, con, spec.oracle)
    assert ok, f"{name}: {msg}"
