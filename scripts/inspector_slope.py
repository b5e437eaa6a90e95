"""Scale-slope evidence for the inspector family (VERDICT r5 directive 7):
does sandwich/JIT candidate generation + the composer stay BLOCK-LOCAL as
the block range grows?

Method: tile the planted fixture blocks (sources/fixtures.py, blocks
100-110, 25 txs) by block-number offset — same per-block tx density, so
total work must grow linearly in the number of blocks if every stage is
block-local. tx hashes get a per-copy suffix and all timestamps shift per
copy by >> the markout window, so copies can never cross-match; searcher/
pool dims stay shared (the realistic shape: the same searchers appear
across the whole range).

Measured at 100x vs 1000x blocks (2.8k vs 28k action rows): small enough
to run in seconds, large enough that a cross-block quadratic would be
unmissable (28k rows joined across blocks = 10^8+ pairs). The reported
exponent log10(t_1000x / t_100x) is therefore an UPPER-BOUND check — fixed
scheduler overhead floors it below 1.0; anything approaching 2.0 would
mean a stage leaked across blocks.

Prints one JSON line per op. Usage: python scripts/inspector_slope.py
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from brontes_spark import schemas as S
from brontes_spark.inspectors.accounting import action_deltas, gas_usd, usd_deltas
from brontes_spark.inspectors.composer import run_composer
from brontes_spark.inspectors.jit import jit_bundles
from brontes_spark.inspectors.sandwich import sandwich_bundles
from brontes_spark.sources import fixtures as FX

BLOCK_OFF = 1_000          # block-number stride per copy
TS_OFF_S = 1_000_000       # seconds per copy (>> any markout window)
SMALL, BIG = 100, 1000
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _suffix_tx(h: str, i: int) -> str:
    return h if i == 0 else f"{h}_c{i}"


def widen(rows_fn, copies: int, table: str) -> list[dict]:
    """Per-copy block/tx/timestamp remap; per-copy rows otherwise identical
    (same per-block density)."""
    base = rows_fn()
    out: list[dict] = []
    for i in range(copies):
        for r in base:
            r = dict(r)
            if "block_number" in r:
                r["block_number"] += i * BLOCK_OFF
            if "tx_hash" in r:
                r["tx_hash"] = _suffix_tx(r["tx_hash"], i)
            if table == "block_info":
                r["block_timestamp"] += i * TS_OFF_S
            if table in ("cex_trades", "cex_quotes"):
                r["timestamp"] += i * TS_OFF_S * 1_000_000
            out.append(r)
    return out


#: dims shared across the whole block range (not widened)
_SHARED = {"pools", "searcher_info", "univ3_events", "univ3_initial"}


def build_tables(spark: SparkSession, copies: int, workdir: str):
    tables = {}
    for name, (rows_fn, schema_name) in FX._FIXTURE_TABLES.items():
        schema = getattr(S, schema_name)
        rows = rows_fn() if name in _SHARED else widen(rows_fn, copies, name)
        path = f"{workdir}/{name}_{copies}"
        spark.createDataFrame(rows, schema).coalesce(4).write.mode(
            "overwrite"
        ).parquet(path)
        tables[name] = spark.read.schema(schema).parquet(path)
    return tables


def timed(build):
    t0 = time.monotonic()
    n = build().count()
    return time.monotonic() - t0, n


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("inspector-slope")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix=f"inspector_slope_{os.getuid()}_")
    try:
        sized = {}
        for copies in (SMALL, BIG):
            t = build_tables(spark, copies, workdir)
            deltas = usd_deltas(action_deltas(t["actions"]), t["dex_prices"])
            gas = gas_usd(t["tx_info"], t["block_info"])
            args = (t["actions"], t["tx_info"], t["dex_prices"], t["block_info"])
            sized[copies] = {
                "i1_sandwich": lambda a=args, d=deltas, g=gas: sandwich_bundles(
                    *a, deltas=d, gas=g
                ),
                "i10_jit": lambda a=args, d=deltas, g=gas: jit_bundles(
                    *a, deltas=d, gas=g
                ),
                "composer_end_to_end": lambda t=t: run_composer(t)["bundles"],
            }
        # warmup both sizes once (JIT/codegen; fixture pipelines are long DAGs)
        sized[SMALL]["i1_sandwich"]().count()
        for op in sized[SMALL]:
            ts, tb = None, None
            for _ in range(2):  # min-of-2
                a, ns = timed(sized[SMALL][op])
                b, nb = timed(sized[BIG][op])
                ts = a if ts is None else min(ts, a)
                tb = b if tb is None else min(tb, b)
            print(
                json.dumps(
                    {
                        "op": op,
                        "blocks_small": SMALL * 11,
                        "blocks_big": BIG * 11,
                        "t_small_sec": round(ts, 2),
                        "t_big_sec": round(tb, 2),
                        "rows_small": ns,
                        "rows_big": nb,
                        "time_exponent": round(math.log10(tb / ts), 2),
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
