from __future__ import annotations

import os
import sys
from contextlib import contextmanager

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from brontes_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # tests run sf0.001 fixtures where task-SCHEDULING, not compute,
    # dominates every action: measured on representative shuffle-heavy
    # files, local[4] beats local[8] and local[16] (32.8 s vs 44 / 37.5 s
    # for the same 10 tests). Deliberately independent of the bench's
    # $SPARK_GRAFT_CPUS: the driver exports 32 for the perf surface, and
    # inheriting it here would triple the verify-window cost of the suite.
    s = get_spark(
        "brontes-spark-tests", cpus=os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")
    )
    # sf0.001 fixtures execute in microseconds; per-action latency is
    # Catalyst + Janino codegen compilation + AQE stage re-planning, all
    # JVM-side and serial. Interpreted execution with static plans returns
    # IDENTICAL results and halves fresh-plan latency (measured 11.4 s ->
    # 5.3 s for 5 unique plans). Tests that pin codegen spans or AQE
    # artifacts in plan TEXT re-enable per test via codegen_session().
    if os.environ.get("SPARK_GRAFT_TEST_FULL_ENGINE", "0") != "1":
        s.conf.set("spark.sql.codegen.wholeStage", "false")
        s.conf.set("spark.sql.adaptive.enabled", "false")
    yield s
    s.stop()


@contextmanager
def codegen_session(s):
    """Temporarily restore the production execution engine (whole-stage
    codegen + AQE) for tests that assert on plan text containing codegen
    spans ('*'/WholeStageCodegen) or adaptive nodes. Build the DataFrame
    INSIDE the context: physical plans materialize lazily at first access
    with whatever confs are then current."""
    old_cg = s.conf.get("spark.sql.codegen.wholeStage")
    old_aqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.codegen.wholeStage", "true")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        yield s
    finally:
        s.conf.set("spark.sql.codegen.wholeStage", old_cg)
        s.conf.set("spark.sql.adaptive.enabled", old_aqe)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
