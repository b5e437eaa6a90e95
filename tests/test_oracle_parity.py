"""Replicates the driver's t2 correctness gate at sf0.001 for every
registered query: Spark result vs DuckDB oracle, order-insensitive,
bit-exact doubles (see brontes_spark/functions/decimals.py for why that is
achievable)."""

from __future__ import annotations

import pytest

from brontes_spark.plans import REGISTRY

from .oracle import compare, duck_con

NAMES = sorted(REGISTRY)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, sf_dir, con):
    spec = REGISTRY[name]
    df = spec.build(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's weak gate
        return
    ok, msg = compare(df, con, spec.oracle)
    assert ok, f"{name}: {msg}"
