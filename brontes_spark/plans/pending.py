"""Staging area for gate specs built mid-round when the 50-slot driver
window has no headroom.

The driver verifies the FIRST 50 ordered registry entries per round, and a
brand-new gate (no driver history) sorts risk-first — so registering a new
gate can eject a stale re-attestation from the window and break the
rotation contract. When that would happen, stage the spec here with the
SAME (builder, oracle, survey_ref) shape as registry entries: it is
verified by the SAME sf0.01 DuckDB-parity harness
(tests/test_pending_parity.py) and runnable through the CLI, and the next
round promotes it with a one-line move to ``@register``.

Round-8 status: all 21 round-7 staged gates were promoted at r8 start per
the r7 playbook — corpus/sketch/text gates to plans/corpus.py,
x11/x12/x15/s11 to plans/timeseries.py, o7 to plans/relational.py — and
seat in the r8 driver window together with the 29 stalest r6
re-attestations (the 21 remaining r6 gates ride to r9 under local parity
cover; COVERAGE.md names them). Gates built DURING round 8 stage here for
r9 promotion, exactly as the r7 wave did.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec

PENDING: dict[str, QuerySpec] = {}


def pending(name: str, oracle: str | None, survey_ref: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        PENDING[name] = QuerySpec(name=name, build=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco


@pending(
    "dedup_fuzzy_lsh_verified",
    # the oracle recomputes the SAME deterministic MinHash/LSH candidate
    # stream as the dedup_minhash_lsh gate (shared CTE), then brute-forces
    # the edit-distance verify on exactly those pairs — so the gate pins
    # the COMPOSITION (candidates ∘ verify), not just each stage alone
    oracle=None,  # interpolated below: needs llm_data's shingle CTE
    survey_ref="the 100 TB fuzzy-dedup shape (VERDICT r7 directive 3): "
    "MinHash/LSH candidate generation (one shingle shuffle, corpus-linear) "
    "feeding verify_pairs_levenshtein (operators/fuzzy.py) — the exact "
    "O(len*d) thresholded edit-distance kernel runs once per CANDIDATE, "
    "never corpus x corpus; at sf0.01 the LSH stream has 25 candidates of "
    "which max_dist=5 verifies 24 and rejects 1 (dist 8), exercising both "
    "outcomes; scripts/fuzzy_slope.py measures kernel count == candidate "
    "count at 10x data",
)
def dedup_fuzzy_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs
    from ..operators.fuzzy import verify_pairs_levenshtein
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    cands = minhash_lsh_pairs(docs, "doc_id", "text", n=5, num_hashes=16, band_size=4)
    return verify_pairs_levenshtein(cands, docs, "doc_id", "text", max_dist=5)


def _fuzzy_lsh_oracle() -> str:
    from .llm_data import _SQL_SHINGLES

    return f"""
    WITH {_SQL_SHINGLES},
    based AS (
      SELECT doc_id, shingle_h % 2147483647 AS b31
      FROM sh),
    hashed AS (
      SELECT doc_id, seed.i AS seed,
             MIN(((2 * seed.i + 1) * b31 + (seed.i * 1000003 + 12345)) % 2147483647) AS mh
      FROM based, range(0, 16) seed(i)
      GROUP BY doc_id, seed.i),
    banded AS (
      SELECT doc_id, seed // 4 AS band,
             md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS band_sig
      FROM hashed GROUP BY doc_id, seed // 4),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_sig = b.band_sig
      WHERE a.doc_id < b.doc_id)
    SELECT p.id_a, p.id_b, CAST(levenshtein(a.text, b.text) AS INT) AS dist
    FROM pairs p
    JOIN documents a ON p.id_a = a.doc_id
    JOIN documents b ON p.id_b = b.doc_id
    WHERE levenshtein(a.text, b.text) <= 5
    """


PENDING["dedup_fuzzy_lsh_verified"] = QuerySpec(
    name="dedup_fuzzy_lsh_verified",
    build=PENDING["dedup_fuzzy_lsh_verified"].build,
    oracle=_fuzzy_lsh_oracle(),
    survey_ref=PENDING["dedup_fuzzy_lsh_verified"].survey_ref,
)
