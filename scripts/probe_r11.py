"""Per-stage timing probe for a single headline query (round-11 measure
pass, guide §1): runs the query with the UI REST API enabled, then dumps
every stage's wall time / task count / shuffle bytes so the optimization
can target the actual cost, not a guess.

Usage: SPARK_GRAFT_CPUS=32 python scripts/probe_r11.py <query> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from bench import EXTRA
    from brontes_spark.plans import queries
    from brontes_spark.session import get_spark

    os.environ.setdefault("SPARK_UI_PORT", "4099")
    from pyspark.sql import SparkSession

    builder_extra = {
        "spark.ui.enabled": "true",
        "spark.ui.port": os.environ["SPARK_UI_PORT"],
    }
    # replicate get_spark but with UI on
    import brontes_spark.session as sess

    orig = sess.get_spark

    def get_spark_ui(app_name="probe", cpus=None, shuffle_partitions=None):
        s = orig(app_name, cpus, shuffle_partitions)
        return s

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.appName("probe-r11")
        .master(f"local[{cpus}]")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", os.environ["SPARK_UI_PORT"])
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in sess.RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    q = {**queries(), **EXTRA}

    # warmup (2 passes: session machinery + codegen/JIT)
    for _ in range(2):
        spark.catalog.clearCache()
        q[name](spark, SF).count()

    tracker = spark.sparkContext.statusTracker()
    t_all = []
    first_job = None
    for i in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        q[name](spark, SF).count()
        t_all.append(time.time() - t0)
    print(f"{name}: runs={['%.3f' % t for t in t_all]} min={min(t_all):.3f}")

    # stage table from the REST API (whole app; last runs dominate)
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{os.environ['SPARK_UI_PORT']}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    stages.sort(key=lambda s: s["stageId"])
    n_show = len(stages)
    agg = {}
    for s in stages:
        dur = 0.0
        if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
            dur = (
                datetime.strptime(s["completionTime"], fmt)
                - datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            ).total_seconds()
        key = (s["name"].split("\n")[0][:90])
        a = agg.setdefault(key, [0, 0.0, 0, 0, 0])
        a[0] += 1
        a[1] += dur
        a[2] += s["numCompleteTasks"]
        a[3] += s.get("shuffleReadBytes", 0)
        a[4] += s.get("shuffleWriteBytes", 0)
    print(f"-- {len(stages)} completed stages (all {runs+2} passes) --")
    for k, (n, dur, tasks, srd, swr) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(
            f"{dur:8.2f}s n={n:3d} tasks={tasks:5d} shR={srd/1e6:8.1f}MB shW={swr/1e6:8.1f}MB  {k}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
