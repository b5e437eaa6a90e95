"""DuckDB-parity for PENDING gates (plans/pending.py) at the driver's
sf0.01 scale — identical harness to tests/test_oracle_parity.py. A staged
spec's correctness gate IS this module until its round promotes it to the
registry (empty staging area == zero parametrized cases, by design; the 21
round-7 staged gates were promoted at r8 start and are covered by
test_oracle_parity.py like every other registered gate)."""

from __future__ import annotations

import os

import pytest

from brontes_spark.plans.pending import PENDING

from .oracle import compare, duck_con

NAMES = sorted(PENDING)

PARITY_SF_DIR = os.environ.get(
    "SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01"
)


@pytest.fixture(scope="module")
def sf_dir():
    return PARITY_SF_DIR


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", NAMES)
def test_pending_matches_oracle(name, spark, sf_dir, con):
    spec = PENDING[name]
    df = spec.build(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    ok, msg = compare(df, con, spec.oracle)
    assert ok, f"{name}: {msg}"
