"""Seeded randomized sweeps (the repo's Spark-side property-test idiom)
pinning the round-7 flagship operators against brute-force Python
references: duplicate_spans / trim_duplicate_spans over random small-vocab
corpora (small vocabulary forces real cross-doc gram collisions), and
gapfill's grid/locf/interpolation against a float-identical reference."""

from __future__ import annotations

import random

from brontes_spark.operators.gapfill import gapfill
from brontes_spark.operators.spans import duplicate_spans, trim_duplicate_spans


def _ref_spans(docs: dict[int, list[str]], k: int):
    occ: dict[tuple, list] = {}
    for i, toks in docs.items():
        for p in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[p : p + k]), []).append((i, p))
    flagged: list[tuple[int, int]] = []
    for lst in occ.values():
        if len(lst) > 1:
            canon = min(lst)
            flagged.extend(x for x in lst if x != canon)
    by: dict[int, list] = {}
    for i, p in flagged:
        by.setdefault(i, []).append((p, p + k))
    out = []
    for i, iv in by.items():
        iv.sort()
        cs, ce = iv[0]
        for s, e in iv[1:]:
            if s > ce:
                out.append((i, cs, ce))
                cs, ce = s, e
            else:
                ce = max(ce, e)
        out.append((i, cs, ce))
    return sorted(out)


def test_duplicate_spans_random_sweep(spark):
    rng = random.Random(1031)
    for trial in range(4):
        vocab = [f"w{i}" for i in range(rng.randrange(3, 8))]
        k = rng.randrange(2, 5)
        docs = {
            i: [rng.choice(vocab) for _ in range(rng.randrange(0, 30))]
            for i in range(rng.randrange(5, 15))
        }
        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
        )
        got = sorted(tuple(r) for r in duplicate_spans(df, "doc_id", "text", k=k).collect())
        assert got == _ref_spans(docs, k), f"trial {trial} k={k}"


def test_trim_random_sweep_consistency(spark):
    rng = random.Random(57)
    vocab = [f"v{i}" for i in range(5)]
    docs = {
        i: [rng.choice(vocab) for _ in range(rng.randrange(0, 25))]
        for i in range(12)
    }
    k = 3
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    spans = {}
    for i, s, e in _ref_spans(docs, k):
        spans.setdefault(i, []).append((s, e))
    got = {r.id: (r.text_trimmed, r.n_tokens, r.kept_tokens)
           for r in trim_duplicate_spans(df, "doc_id", "text", k=k).collect()}
    for i, toks in docs.items():
        removed = set()
        for s, e in spans.get(i, []):
            removed.update(range(s, e))
        kept = [t for p, t in enumerate(toks) if p not in removed]
        assert got[i] == (" ".join(kept), len(toks), len(kept)), i


def _ref_gapfill(points: list[tuple[int, float]], step: int):
    if not points:
        return []
    pts = sorted(points)
    mn, mx = pts[0][0], max(t for t, _ in pts)
    out = []
    t = (mn // step) * step
    while t <= mx:
        prevs = [(pt, pv) for pt, pv in pts if pt <= t]
        nexts = [(pt, pv) for pt, pv in pts if pt >= t]
        ff = prevs[-1][1] if prevs else None
        if not prevs:
            interp = None
        elif not nexts or nexts[0][0] == prevs[-1][0]:
            interp = ff
        else:
            pt, pv = prevs[-1]
            nt, nv = nexts[0]
            interp = pv + (nv - pv) * ((t - pt) / (nt - pt))
        out.append((t, ff, interp))
        t += step
    return out


def test_gapfill_random_sweep(spark):
    rng = random.Random(733)
    for trial in range(3):
        step = rng.choice([7, 10, 25])
        series = {}
        rows = []
        for key in ("a", "b", "c"):
            # distinct timestamps per key: ties are pinned elsewhere
            ts = rng.sample(range(0, 500), rng.randrange(1, 12))
            pts = [(t, round(rng.uniform(-5, 5), 3)) for t in ts]
            series[key] = pts
            rows += [(key, t, v) for t, v in pts]
        df = spark.createDataFrame(rows, "k string, ts long, v double")
        got: dict = {}
        for r in gapfill(df, "k", "ts", "v", step=step).collect():
            got.setdefault(r.key, []).append((r.grid_ts, r.value_ffill, r.value_interp))
        for key, pts in series.items():
            assert sorted(got[key]) == _ref_gapfill(pts, step), f"{trial}/{key}/{step}"
