"""BPE training (operators/bpe.py) vs an independent Python reference:
the reference is the classic dict-of-tuples implementation (list-walk
greedy merge), exercised on the Sennrich et al. toy corpus and seeded
random corpora; plus merge-semantics edge cases (overlap, anchoring)."""

from __future__ import annotations

import pytest

import random
from collections import Counter

from brontes_spark.operators.bpe import (
    END,
    apply_merge,
    bpe_train,
    encode_words,
    initial_symbols,
    pair_stats,
    word_vocabulary,
)

# ---------------------------------------------------------- py reference


def _py_vocab(texts: list[str]) -> dict[tuple[str, ...], int]:
    words = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w and all("a" <= c <= "z" for c in w):
                words[w] += 1
    return {tuple(w) + (END,): n for w, n in words.items()}


def _py_stats(vocab: dict[tuple[str, ...], int]) -> Counter:
    st = Counter()
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            st[(syms[i], syms[i + 1])] += n
    return st


def _py_merge(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _py_train(texts: list[str], n_merges: int):
    vocab = _py_vocab(texts)
    merges = []
    for _ in range(n_merges):
        st = _py_stats(vocab)
        if not st:
            break
        best = min(st.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_py_merge(s, best): n for s, n in vocab.items()}
    return merges, vocab


# ----------------------------------------------------------------- tests


@pytest.mark.slow
def test_bpe_train_matches_reference_sennrich_toy(spark):
    texts = ["low low low low low lower lower newest newest",
             "newest newest newest newest widest widest widest"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, vocab = bpe_train(df, 8)
    ref_merges, ref_vocab = _py_train(texts, 8)
    assert merges == ref_merges
    got = {tuple(r["syms"].split(" ")): r["n"] for r in vocab.collect()}
    assert got == ref_vocab


def test_bpe_train_matches_reference_random_corpus(spark):
    rng = random.Random(3)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randrange(1, 7)))
             for _ in range(120)]
    texts = [" ".join(rng.choice(words) for _ in range(30)) for _ in range(8)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, _ = bpe_train(df, 12)
    ref_merges, _ = _py_train(texts, 12)
    assert merges == ref_merges


def test_merge_overlap_is_left_to_right_greedy(spark):
    # 'a a a' merging (a,a) -> ['aa','a'], never ['a','aa'] or ['aaa']
    df = spark.createDataFrame([("w", 1, "a a a")], "word string, n long, syms string")
    got = apply_merge(df, "a", "a").collect()[0]["syms"]
    assert got == "aa a"
    assert _py_merge(("a", "a", "a"), ("a", "a")) == ("aa", "a")


def test_merge_is_whole_symbol_anchored(spark):
    # merging (a,b) must not touch 'xa b' or 'a bx' symbol boundaries
    df = spark.createDataFrame(
        [("w1", 1, "xa b"), ("w2", 1, "a bx"), ("w3", 1, "a b")],
        "word string, n long, syms string",
    )
    got = {r["word"]: r["syms"] for r in apply_merge(df, "a", "b").collect()}
    assert got == {"w1": "xa b", "w2": "a bx", "w3": "ab"}


def test_merge_of_multichar_symbols(spark):
    df = spark.createDataFrame(
        [("w", 1, "es t </w>")], "word string, n long, syms string"
    )
    got = apply_merge(df, "es", "t").collect()[0]["syms"]
    assert got == "est </w>"


def test_pair_stats_weighted_by_word_frequency(spark):
    df = spark.createDataFrame([("ab ab cd",)], "text string")
    vocab = word_vocabulary(df)
    assert {r["word"]: r["n"] for r in vocab.collect()} == {"ab": 2, "cd": 1}
    # 'ab' appears twice -> its pair carries the word multiplicity
    stats = pair_stats(initial_symbols(vocab, end_marker=False))
    got = {(r["a"], r["b"]): r["pair_n"] for r in stats.collect()}
    assert got == {("a", "b"): 2, ("c", "d"): 1}


def test_single_char_words_produce_no_pairs(spark):
    df = spark.createDataFrame([("a b c a",)], "text string")
    vocab = initial_symbols(word_vocabulary(df), end_marker=False)
    assert pair_stats(vocab).count() == 0


def test_encode_words_replays_learned_merges(spark):
    train = spark.createDataFrame([("hello hello hell",)], "text string")
    merges, _ = bpe_train(train, 4)
    fresh = initial_symbols(word_vocabulary(train))
    enc = {r["word"]: r["syms"] for r in encode_words(fresh, merges).collect()}
    ref_merges, ref_vocab = _py_train(["hello hello hell"], 4)
    want = {"".join(s).replace(END, ""): " ".join(s) for s in ref_vocab}
    assert {w: enc[w] for w in want} == want
