"""duplicate_spans — cross-document duplicate token runs (the
relational ExactSubstr shape, Lee et al. 2021).

Fixtures are hand-computed: every expected (start_a, start_b,
match_tokens) row below was derived on paper from the token streams.
"""

import pytest

from docling_translate_spark.operators.dedup import duplicate_spans


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _runs(df, **kw):
    return {
        (r.id_a, r.id_b, r.start_a, r.start_b, r.match_tokens)
        for r in duplicate_spans(df, **kw).collect()
    }


def test_shared_run_found_with_exact_offsets(spark):
    # docs 1/2 share "the quick brown fox jumps over" (6 tokens) at
    # token offsets 2 (doc 1) and 0 (doc 2); k=4 grams -> run of 3
    # consecutive k-grams -> 3 + 4 - 1 = 6 match tokens
    df = _df(
        spark,
        [
            (1, "intro words the quick brown fox jumps over tail one"),
            (2, "the quick brown fox jumps over something else entirely here"),
        ],
    )
    got = _runs(df, k=4, min_run=3)
    assert got == {(1, 2, 2, 0, 6)}


def test_runs_below_min_run_dropped(spark):
    # only 4 shared consecutive tokens = one k=4 gram -> run length 1
    df = _df(
        spark,
        [
            (1, "alpha beta gamma delta unique tail padding words here"),
            (2, "alpha beta gamma delta other continuation text goes here now"),
        ],
    )
    assert _runs(df, k=4, min_run=3) == set()
    # ... but min_run=1 reports it: 1 + 4 - 1 = 4 match tokens
    got = _runs(df, k=4, min_run=1)
    assert (1, 2, 0, 0, 4) in got


def test_two_separate_runs_reported_separately(spark):
    # shared prefix (6 tokens) and shared suffix (6 tokens) with
    # different middles and DIFFERENT offsets in each doc
    df = _df(
        spark,
        [
            (1, "one two three four five six MID seven eight nine ten eleven twelve"),
            (2, "one two three four five six OTHER GAP seven eight nine ten eleven twelve"),
        ],
    )
    got = _runs(df, k=4, min_run=3)
    assert (1, 2, 0, 0, 6) in got
    assert (1, 2, 7, 8, 6) in got
    # nothing spans across the differing middles
    assert all(t[4] == 6 for t in got)


def test_identical_docs_full_run(spark):
    words = " ".join(f"w{i}" for i in range(12))
    df = _df(spark, [(1, words), (2, words)])
    got = _runs(df, k=4, min_run=3)
    # one maximal run covering all 12 tokens: 9 grams -> 9 + 3 = 12
    assert got == {(1, 2, 0, 0, 12)}


def test_hot_shingle_cap_blocks_pathological_repetition(spark):
    # "spam" * 40 in two docs: every k-gram is the same shingle, 74
    # occurrences > max_occurrences=50 -> stop-shingle, no candidate
    # pairs at all (the cap that keeps a 10^8-occurrence boilerplate
    # gram from squaring itself through the join)
    spam = " ".join(["spam"] * 40)
    df = _df(spark, [(1, spam), (2, spam)])
    assert _runs(df, k=4, min_run=3, max_occurrences=50) == set()


def test_short_docs_excluded(spark):
    df = _df(spark, [(1, "too short"), (2, "too short")])
    assert _runs(df, k=4, min_run=1) == set()


def test_case_and_whitespace_normalized(spark):
    df = _df(
        spark,
        [
            (1, "The  Quick   Brown Fox Jumps Over tail a b"),
            (2, "the quick brown fox jumps over other c d"),
        ],
    )
    got = _runs(df, k=4, min_run=3)
    assert (1, 2, 0, 0, 6) in got


def test_pair_orientation_is_id_ordered(spark):
    df = _df(
        spark,
        [
            (9, "shared run of six matching tokens here unique nine"),
            (3, "shared run of six matching tokens here unique three"),
        ],
    )
    got = _runs(df, k=4, min_run=3)
    assert all(a < b for a, b, *_ in got)
    # shared prefix runs through "unique": 8 tokens
    assert (3, 9, 0, 0, 8) in got


def test_null_text_ignored(spark):
    df = _df(spark, [(1, None), (2, "some words but no partner here at all now")])
    assert _runs(df, k=4, min_run=1) == set()
