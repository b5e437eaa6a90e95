"""Scale-slope evidence for the round-7 operator wave (span dedup, Bloom
decontamination, count-min, KMV set relations, weighted sampling, bigram
LM coverage, gapfill, MAD outliers, URL domain cap).

Same methodology as scripts/scale_slope.py: each operator runs on the
sf0.1 corpus and on a 10x variant built from id-offset copies whose text
goes through a per-copy Caesar cipher (disjoint gram/shingle/bigram spaces
— the 10x corpus behaves like 10x NEW data, not clone groups). Events
widen by user_id offset (10x users, per-key history unchanged — the
real growth axis of event streams). Fixed-workload inputs (the eval set
for decontamination, the probe list for count-min) stay pinned to
original ids so the measurement isolates corpus growth.

Prints one JSON line per op: wall seconds and output rows at 1x/10x plus
the observed exponent log10(t10/t1); ~1.0 = linear, the design target.

Usage: python scripts/slope_r7.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from brontes_spark.functions.text import ws_tokens
from brontes_spark.functions.urls import cap_per_domain
from brontes_spark.operators.anomaly import mad_anomalies
from brontes_spark.operators.bloom import decontaminate_bloom
from brontes_spark.operators.gapfill import gapfill
from brontes_spark.operators.ngram_lm import char_bigram_coverage
from brontes_spark.operators.sampling import sample_weighted
from brontes_spark.operators.sketches import (
    countmin_estimate,
    countmin_sketch,
    kmv_set_relations,
    kmv_sketch,
)
from brontes_spark.operators.spans import duplicate_spans

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
COPIES = 10
OFFSET = 1_000_000

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def widen_docs(docs):
    parts = [docs]
    for i in range(1, COPIES):
        rot = ALPHA[i:] + ALPHA[:i]
        parts.append(
            docs.select(
                (F.col("doc_id") + i * OFFSET).alias("doc_id"),
                F.translate(
                    F.col("text"), ALPHA + ALPHA.upper(), rot + rot.upper()
                ).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            ).select(*docs.columns)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def widen_events(ev):
    parts = [ev]
    for i in range(1, COPIES):
        parts.append(
            ev.select(
                (F.col("event_id") + i * OFFSET).alias("event_id"),
                "ts",
                (F.col("user_id") + i * OFFSET).alias("user_id"),
                "event_type",
                "value",
                "props",
            ).select(*ev.columns)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(df):
    t0 = time.monotonic()
    n = df.count()
    return time.monotonic() - t0, n


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("slope-r7")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev_raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev1 = ev_raw.withColumn(
        "ts_ns", (F.col("ts").cast("long") if dict(ev_raw.dtypes)["ts"] in ("bigint", "long")
                  else F.unix_timestamp("ts") * 1_000_000_000)
    )
    docs10 = widen_docs(docs1)
    ev10 = widen_events(ev_raw).withColumn(
        "ts_ns", (F.col("ts").cast("long") if dict(ev_raw.dtypes)["ts"] in ("bigint", "long")
                  else F.unix_timestamp("ts") * 1_000_000_000)
    )

    def _tokens(d):
        return d.select(F.explode(ws_tokens(F.col("text"))).alias("v"))

    def _countmin(d, e, big):
        occ = _tokens(d)
        sk = countmin_sketch(occ, "v", width=1024, depth=4)
        # probe workload fixed: the original corpus's distinct tokens
        items = _tokens(docs1).distinct()
        return countmin_estimate(items, sk, "v", width=1024, depth=4)

    def _kmv_jacc(d, e, big):
        toks = d.select(
            "doc_id", F.col("lang").alias("key"),
            F.explode(ws_tokens(F.col("text"))).alias("v"),
        )
        a = toks.filter(F.col("doc_id") % 2 == 0)
        b = toks.filter(F.col("doc_id") % 2 == 1)
        return kmv_set_relations(
            kmv_sketch(a, "key", "v", k=128), kmv_sketch(b, "key", "v", k=128), k=128
        )

    GF_STEP = 21_600_000_000_000

    ops = {
        "dedup_span_exact": lambda d, e, big: duplicate_spans(d, "doc_id", "text", k=8),
        "txt_bigram_coverage": lambda d, e, big: char_bigram_coverage(
            d, "doc_id", "text", top_m=200, sample_rate=0.2
        ),
        # fixed eval set (original ids), growing corpus — mirrors the
        # txt_decontaminate slope row for the bloom-prefiltered variant
        "txt_decontaminate_bloom": lambda d, e, big: decontaminate_bloom(
            d.filter((F.col("doc_id") % 97 != 0) | (F.col("doc_id") >= OFFSET)),
            d.filter((F.col("doc_id") % 97 == 0) & (F.col("doc_id") < OFFSET)),
            "doc_id", "text", n=3, m_bits=1 << 18,
        ),
        "sketch_countmin": _countmin,
        "sketch_kmv_jaccard": _kmv_jacc,
        "sample_weighted": lambda d, e, big: sample_weighted(
            d.select("doc_id", F.col("n_chars").alias("w")),
            "doc_id", "w", m=50, weight_scale=16,
        ),
        "corpus_domain_cap": lambda d, e, big: cap_per_domain(
            d.select("doc_id", F.concat(F.col("source"), F.lit(".example.com")).alias("dom")),
            "doc_id", "dom", cap=10,
        ),
        "x11_gapfill": lambda d, e, big: gapfill(
            e.filter(F.col("value").isNotNull()), "user_id", "ts_ns", "value",
            step=GF_STEP,
        ),
        "x12_mad_outliers": lambda d, e, big: mad_anomalies(
            e.select("event_id", "event_type", "value"),
            "event_type", "value", k=3.0, keep_cols=["event_id"],
        ),
    }

    # warmup
    _tokens(docs1).count()

    for name, build in ops.items():
        t1, n1 = timed(build(docs1, ev1, False))
        t10, n10 = timed(build(docs10, ev10, True))
        print(
            json.dumps(
                {
                    "op": name,
                    "t1_s": round(t1, 2),
                    "t10_s": round(t10, 2),
                    "rows1": n1,
                    "rows10": n10,
                    "exponent": round(math.log10(max(t10, 1e-9) / max(t1, 1e-9)), 2),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
