"""BPE merge statistics (operators/bpe.py) — hand-pinned micro corpus,
driver-loop parity (stats rank-1 == first merge), and a pure-Python
exact twin over the real sf0.001 documents."""

from collections import Counter

import pandas as pd

from docling_translate_spark.operators.bpe import (
    EOW,
    bpe_merges,
    bpe_pair_stats,
    bpe_word_histogram,
)

SF_DIR = "/root/testdata/sf0.001"


def _df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_micro_counts_pinned(spark):
    out = bpe_pair_stats(_df(spark, ["low low", "Lower!"]), top_k=10).collect()
    got = {(r["left"], r["right"]): (r["pair_count"], r["rank"]) for r in out}
    # hist: low×2, lower×1 → (l,o)=3 (o,w)=3 (w,</w>)=2 (w,e)=1 (e,r)=1
    # (r,</w>)=1; ties break (left, right) ascending
    assert got[("l", "o")] == (3, 1)
    assert got[("o", "w")] == (3, 2)
    assert got[("w", EOW)] == (2, 3)
    assert got[("e", "r")] == (1, 4)
    assert got[("r", EOW)] == (1, 5)
    assert got[("w", "e")] == (1, 6)
    assert len(got) == 6


def test_single_char_words_and_nulls(spark):
    df = spark.createDataFrame([("a b a",), (None,), ("",)], "text string")
    out = bpe_pair_stats(df, top_k=10).collect()
    got = {(r["left"], r["right"]): r["pair_count"] for r in out}
    assert got == {("a", EOW): 2, ("b", EOW): 1}


def test_merge_loop_matches_stats_round1(spark):
    texts = ["the cat sat on the mat", "the hat of the cat"]
    hist = {
        r["word"]: r["wc"]
        for r in bpe_word_histogram(_df(spark, texts)).collect()
    }
    merges = bpe_merges(sorted(hist.items()), n_merges=3)
    top = bpe_pair_stats(_df(spark, texts), top_k=1).collect()[0]
    assert merges[0] == (top["left"], top["right"])
    # hand-computed: words the×4 cat×2 sat mat on of hat. Round 1:
    # ('a','t') and ('t',EOW) tie at 5, lexicographic min 'a' < 't'
    # wins; round 2 ('at',EOW)=5; round 3 the three the-pairs tie at 4,
    # ('e',EOW) < ('h','e') < ('t','h').
    assert merges[0] == ("a", "t")
    assert merges[1] == ("at", EOW)
    assert merges[2] == ("e", EOW)


def test_max_vocab_cutoff(spark):
    texts = ["aa aa aa bb bb cc"]
    out = bpe_pair_stats(_df(spark, texts), top_k=10, max_vocab=2).collect()
    got = {(r["left"], r["right"]): r["pair_count"] for r in out}
    # only aa (wc 3) and bb (wc 2) survive the cutoff; cc is dropped
    assert got == {
        ("a", "a"): 3,
        ("a", EOW): 3,
        ("b", "b"): 2,
        ("b", EOW): 2,
    }


def _python_twin(texts, top_k):
    import re

    wc: Counter = Counter()
    for t in texts:
        # extract-then-lower, matching the operator (ASCII-only words
        # lowercase identically everywhere; see the module alphabet note)
        wc.update(w.lower() for w in re.findall("[A-Za-z]+", t or ""))
    pc: Counter = Counter()
    for w, c in wc.items():
        syms = list(w) + [EOW]
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += c
    ordered = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return [
        (l, r, c, i + 1) for i, ((l, r), c) in enumerate(ordered)
    ]


def test_python_twin_on_sf0001(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = bpe_pair_stats(docs, top_k=50).collect()
    got = [(r["left"], r["right"], r["pair_count"], r["rank"]) for r in out]
    got.sort(key=lambda t: t[3])
    texts = [
        r["text"] for r in docs.select("text").collect()
    ]
    assert got == _python_twin(texts, 50)


def test_unicode_case_never_reaches_words(spark):
    """Extract-then-lower: 'İ' (U+0130) between ASCII letters must not
    merge or split words differently per engine. Java's lower('AİB')
    is 'ai̇b' (the combining-dot expansion leaks an ASCII 'i' into a
    [a-z]+ run); extracting [A-Za-z]+ from the raw text first yields
    A, B in every engine, then ASCII lower() agrees everywhere."""
    df = spark.createDataFrame([("AİB xy",)], "text string")
    from docling_translate_spark.operators.bpe import bpe_word_histogram

    words = {r["word"] for r in bpe_word_histogram(df).collect()}
    assert words == {"a", "b", "xy"}
