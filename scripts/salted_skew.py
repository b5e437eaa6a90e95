"""Hot-key shuffle-join wall time, salted vs plain (SCALE.md row).

Synthesizes a skewed fact side — `uniform` rows spread over 10k keys plus
ONE key carrying `hot` rows — and a 10k-row dim side, then times the
plain shuffle join against salted_join at several hot sizes. Broadcast is
disabled (the dim is broadcastable here only because the fixture is
small; the measurement models the non-broadcastable regime) and AQE's
skewedJoin is disabled for the baseline so the effect measured is the
salting itself, with a third timing AQE-on for the honest comparison the
operator docstring makes."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from brontes_spark.operators.salted import salted_join
from brontes_spark.session import get_spark


def main() -> None:
    spark = get_spark("salted-skew")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    dim = spark.range(10_000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        F.col("id").alias("dim_val"),
    ).localCheckpoint()

    for hot in (0, 10**5, 10**6):
        uniform = spark.range(1_000_000).select(
            F.concat(F.lit("k"), (F.col("id") % 10_000).cast("string")).alias("k"),
            F.col("id").alias("fact_id"),
        )
        fact = uniform
        if hot:
            fact = fact.unionByName(
                spark.range(hot).select(
                    F.lit("k7").alias("k"), (F.col("id") + 10**9).alias("fact_id")
                )
            )
        fact = fact.localCheckpoint()

        def t(fn, aqe_skew):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
            best = 1e9
            for _ in range(2):
                s = time.time()
                fn().count()
                best = min(best, time.time() - s)
            return round(best, 2)

        plain = t(lambda: fact.join(dim, "k"), aqe_skew=False)
        plain_aqe = t(lambda: fact.join(dim, "k"), aqe_skew=True)
        salted = t(lambda: salted_join(fact, dim, ["k"], n_salts=32), aqe_skew=False)
        print(json.dumps({
            "hot_rows": hot,
            "plain_join_sec": plain,
            "plain_join_aqe_skew_sec": plain_aqe,
            "salted_join_sec": salted,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
