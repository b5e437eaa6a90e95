"""Scale evidence for the LSH->levenshtein fuzzy-dedup composition
(VERDICT r7 directive 3 done-condition): the exact edit-distance kernel
must run once per LSH CANDIDATE, never corpus x corpus.

Measures, at sf0.01 and sf0.1:
  * n_docs and the corpus-pair count N*(N-1)/2 (what a naive kernel pays),
  * n_candidates out of minhash_lsh_pairs (what the verify stage pays —
    kernel invocations == candidate rows by construction: the kernel is a
    projection over the candidate join, so the row count IS the count),
  * n_verified (dist <= 5 survivors),
  * wall time of candidates-only vs the full composition (the delta is the
    verify stage: two id joins + one thresholded kernel per candidate).

Output: one JSON line per sf for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from brontes_spark.operators.dedup import minhash_lsh_pairs
from brontes_spark.operators.fuzzy import verify_pairs_levenshtein
from brontes_spark.session import get_spark
from brontes_spark.sources.testdata import load_table


def main() -> None:
    spark = get_spark("fuzzy-slope")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()

        def cands():
            return minhash_lsh_pairs(
                docs, "doc_id", "text", n=5, num_hashes=16, band_size=4
            )

        def composed():
            return verify_pairs_levenshtein(
                cands(), docs, "doc_id", "text", max_dist=5
            )

        best_c, best_f, n_cand, n_ver = 1e9, 1e9, 0, 0
        for _ in range(3):
            spark.catalog.clearCache()
            t = time.time()
            n_cand = cands().count()
            best_c = min(best_c, time.time() - t)
            spark.catalog.clearCache()
            t = time.time()
            n_ver = composed().count()
            best_f = min(best_f, time.time() - t)
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_docs": n_docs,
                    "corpus_pairs": n_docs * (n_docs - 1) // 2,
                    "n_candidates": n_cand,
                    "n_verified": n_ver,
                    "candidates_sec": round(best_c, 2),
                    "composed_sec": round(best_f, 2),
                    "verify_delta_sec": round(best_f - best_c, 2),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
