"""Scale-slope evidence for the dedup/ANN family (VERDICT r4 directive 7).

Runs each family operator on the sf0.1 corpus (5k docs / 5k embeddings) and
on a 10x variant built by unioning ten id-offset copies. Each text copy is
passed through a per-copy Caesar cipher (F.translate) and each embedding
copy through a per-copy array rotation: both transforms preserve the
corpus's internal duplicate/similarity structure while making the copies
mutually disjoint — i.e. the 10x corpus behaves like 10x NEW documents with
the same statistics, not 10-way clone groups (pure clones make every
shingle/bucket 10x hotter and measure pathological duplication, not corpus
growth). ANN probe sets are pinned to the ORIGINAL ids so the measurement
isolates corpus growth (queries fixed, candidates x10) — the "corpus grows
under a fixed workload" scenario.

Prints one JSON line per operator: wall seconds at 1x and 10x, output rows
at both scales, and the observed time exponent log10(t10/t1) — ~1.0 means
linear in corpus size, the design target for every candidate-bounded
operator (brute-force cosine is the documented O(Q*N) baseline and is
expected to ride Q fixed -> linear here too).

Usage: python scripts/scale_slope.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from brontes_spark.operators.dedup import (
    decontaminate,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from brontes_spark.operators.packing import pack_sequences
from brontes_spark.operators.dedup import hamming_neardup_pairs
from brontes_spark.operators.similarity import (
    cosine_dup_pairs,
    cosine_topk,
    hierarchical_assign,
    ivf_topk,
    kmeans_refine_assign,
    lsh_buckets,
    semantic_dedup,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
COPIES = 10
OFFSET = 1_000_000  # id offset per copy; original ids stay < OFFSET


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


def widen_embeddings(emb):
    parts = [emb]
    for i in range(1, COPIES):
        # per-copy random sign modulation: (s_i . v) dot (s_i . w) = v dot w,
        # so every copy's INTERNAL similarity structure is exactly preserved,
        # while cross-copy dots pick up random sign cancellation and
        # decorrelate. (A plain array rotation fails this for smooth vectors:
        # rot_k(v) stays close to v, recreating clone groups.)
        sign = lambda d, i=i: (  # noqa: E731
            1 - 2 * F.pmod(F.xxhash64(d.cast("string"), F.lit(i)), F.lit(2))
        ).cast("float")
        parts.append(
            emb.select(
                (F.col("vec_id") + i * OFFSET).alias("vec_id"),
                F.transform(
                    F.col("embedding"), lambda x, d: (x * sign(d)).cast("float")
                ).alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            ).select(*emb.columns)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(df) -> tuple[float, int]:
    t0 = time.monotonic()
    n = df.count()
    return time.monotonic() - t0, n


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale-slope")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs10 = widen_docs(docs1)
    emb10 = widen_embeddings(emb1)
    fixed_q = (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < OFFSET)

    # builders take (docs, emb, big): `big` lets an op move to its documented
    # 10x operating point (e.g. LSH planes grow ~log2(N) to hold bucket
    # occupancy constant); the *_fixed variant shows the cost of NOT turning
    # that dial.
    ops = {
        "dedup_exact": lambda d, e, big: exact_dedup(d, "doc_id", F.md5(F.col("text"))),
        "dedup_minhash_lsh": lambda d, e, big: minhash_lsh_pairs(
            d, "doc_id", "text", n=5, num_hashes=16, band_size=4
        ),
        "dedup_ngram_jaccard": lambda d, e, big: ngram_jaccard_pairs(
            d, "doc_id", "text", block_col="lang", n=5, threshold=0.1
        ),
        "dedup_simhash": lambda d, e, big: simhash(d, "doc_id", "text", bits=32),
        "dedup_embedding_cosine_fixed_planes": lambda d, e, big: cosine_dup_pairs(
            e, "vec_id", "embedding", threshold=0.3, planes=8
        ),
        "dedup_embedding_cosine_scaled_planes": lambda d, e, big: cosine_dup_pairs(
            e, "vec_id", "embedding", threshold=0.3, planes=11 if big else 8
        ),
        "ann_cosine_topk": lambda d, e, big: cosine_topk(
            e, "vec_id", "embedding", query_pred=fixed_q, k=5
        ),
        "ann_ivf_topk": lambda d, e, big: ivf_topk(
            e, "vec_id", "embedding", query_pred=fixed_q, k=5,
            k_clusters=25 if big else 8, nprobe=2,
        ),
        "ann_lsh_buckets": lambda d, e, big: lsh_buckets(
            e, "vec_id", "embedding", planes=8
        ),
        # fixed benchmark set (original ids only), growing corpus — the
        # real decontamination scenario; eval shingles broadcast either way
        "txt_decontaminate": lambda d, e, big: decontaminate(
            d.filter((F.col("doc_id") % 97 != 0) | (F.col("doc_id") >= OFFSET)),
            d.filter((F.col("doc_id") % 97 == 0) & (F.col("doc_id") < OFFSET)),
            "doc_id", "text", n=3,
        ),
        # SemDeDup: fixed k shows the quadratic pair stage, scaled k the
        # linear operating point (SCALE.md round-6 cluster dial)
        "dedup_semantic_fixed_k": lambda d, e, big: semantic_dedup(
            e, "vec_id", "embedding", threshold=0.3, k_clusters=8
        ),
        "dedup_semantic_scaled_k": lambda d, e, big: semantic_dedup(
            e, "vec_id", "embedding", threshold=0.3,
            k_clusters=80 if big else 8,
            hierarchical=big, nprobe_super=3,
        ),
        "ann_kmeans_refine": lambda d, e, big: kmeans_refine_assign(
            e, "vec_id", "embedding", k_clusters=25 if big else 8, iters=1
        ),
        "ann_hierarchical_assign": lambda d, e, big: hierarchical_assign(
            e, "vec_id", "embedding", k_clusters=80 if big else 8,
            nprobe_super=2,
        ),
        # banded Hamming over 32-bit simhash: 4x8-bit bands (the oracle
        # geometry); SCALE.md documents the width dial separately
        "dedup_simhash_pairs": lambda d, e, big: hamming_neardup_pairs(
            simhash(d, "doc_id", "text", bits=32), "id", "simhash",
            bits=32, bands=4, max_hamming=3,
        ),
        "txt_pack_sequences": lambda d, e, big: pack_sequences(
            d.select("doc_id", "lang",
                     F.size(F.split(F.lower("text"), " ")).alias("n_tokens")),
            "doc_id", "n_tokens", "lang", context_len=256,
        ),
    }

    # JVM/codegen warmup so the 1x timings aren't paying first-job costs
    exact_dedup(docs1, "doc_id", F.md5(F.col("text"))).count()

    import math

    REPEATS = 2  # min-of-2 damps GC/shared-VM jitter

    for name, build in ops.items():
        t1 = n1 = t10 = n10 = None
        for _ in range(REPEATS):
            t, n = timed(build(docs1, emb1, False))
            t1, n1 = (t, n) if t1 is None else (min(t1, t), n)
            t, n = timed(build(docs10, emb10, True))
            t10, n10 = (t, n) if t10 is None else (min(t10, t), n)
        print(
            json.dumps(
                {
                    "op": name,
                    "t1_sec": round(t1, 2),
                    "t10_sec": round(t10, 2),
                    "rows1": n1,
                    "rows10": n10,
                    "time_exponent": round(math.log10(t10 / t1), 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
