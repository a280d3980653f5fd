"""C4-style bad-words lexicon filter (operators/scrub.py).

Token-boundary semantics: a lexicon term matches maximal [a-z0-9] runs
of the lowercased text, never substrings; multi-word phrases match with
any non-alnum run between words.
"""

import pytest

from docling_translate_spark.operators.scrub import (
    badwords_flags,
    filter_badwords,
)

LEX = ("ass", "slow", "hash join", "zyzzyva")


def _flags(spark, text, lex=LEX):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = badwords_flags(df, lex).collect()[0]
    return list(r.bad_terms), r.n_bad


def test_word_matches_with_punctuation(spark):
    assert _flags(spark, "that was (slow)!") == (["slow"], 1)


def test_substring_does_not_match(spark):
    # "class" contains "ass" as a substring but not as a token
    assert _flags(spark, "the class is classy") == ([], 0)


def test_case_insensitive(spark):
    assert _flags(spark, "SLOW Ass") == (["ass", "slow"], 2)


def test_phrase_matches_across_punctuation(spark):
    # words of a phrase may be separated by any non-alnum run
    assert _flags(spark, "use a Hash-Join here") == (["hash join"], 1)


def test_phrase_needs_both_words_in_order(spark):
    assert _flags(spark, "join the hash") == ([], 0)
    assert _flags(spark, "hashjoin") == ([], 0)


def test_phrase_at_string_edges(spark):
    assert _flags(spark, "hash join") == (["hash join"], 1)


def test_never_term_and_null_text(spark):
    assert _flags(spark, "perfectly clean text") == ([], 0)
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = badwords_flags(df, LEX).collect()[0]
    assert (list(r.bad_terms), r.n_bad) == ([], 0)


def test_terms_sorted_and_deduped(spark):
    got, n = _flags(spark, "slow ass slow hash join ass")
    assert got == ["ass", "hash join", "slow"] and n == 3


def test_filter_drops_flagged_rows_and_columns(spark):
    df = spark.createDataFrame(
        [(1, "slow day"), (2, "fine day"), (3, None)],
        "doc_id long, text string",
    )
    out = filter_badwords(df, LEX)
    assert sorted(r.doc_id for r in out.collect()) == [2, 3]
    assert out.columns == ["doc_id", "text"]


def test_empty_term_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        badwords_flags(df, ("ok", " "))


def test_words_only_and_phrases_only_lexicons(spark):
    assert _flags(spark, "slow hash join", ("slow",)) == (["slow"], 1)
    assert _flags(spark, "slow hash join", ("hash join",)) == (
        ["hash join"],
        1,
    )


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = badwords_flags(df, LEX)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
