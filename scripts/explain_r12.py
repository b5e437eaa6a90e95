"""Dump .explain("formatted") for headline queries to plans/r11/.

Usage: python scripts/explain_r11.py <suffix> [query ...]
  suffix: "before" / "after" — file becomes plans/r11/<query>_<suffix>.txt
  with no query args, dumps every bench.py HEADLINE query.

Plan-only (no execution beyond the tiny dim-peek/count actions some
builders embed), so it is cheap to run at the bench scale factor.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from bench import EXTRA, HEADLINE
    from brontes_spark.plans import queries
    from brontes_spark.session import get_spark

    q = {**queries(), **EXTRA}
    if not names:
        names = HEADLINE
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("explain-r12", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = q[name](spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "ERROR\n" + traceback.format_exc()
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else "ERROR", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
