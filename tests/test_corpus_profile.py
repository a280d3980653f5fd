"""Corpus data-card profile: hand-computed exact quantiles, tie and
duplicate handling, NULL text, partition independence, and the
histogram-not-hot-key-window plan shape."""

import contextlib
import io
import re

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.metrics import corpus_profile


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [("a", "x" * n) for n in range(1, 11)]  # lengths 1..10
    rows += [("b", "same len")] * 4  # ties + exact dupes
    rows += [("c", None), ("c", "abc")]  # NULL text
    return spark.createDataFrame(rows, "source string, text string")


def test_hand_computed_card(spark, docs):
    card = {r["source"]: r for r in corpus_profile(docs).collect()}
    a = card["a"]
    # n=10: rank(q) = ceil(q*n/100) -> 3, 5, 8, 9 -> the 3rd/5th/8th/9th
    # smallest of lengths 1..10
    assert (a["n_docs"], a["total_chars"], a["distinct_texts"]) == (10, 55, 10)
    assert (a["p25_len"], a["p50_len"], a["p75_len"], a["p90_len"]) == (3, 5, 8, 9)
    b = card["b"]
    assert (b["n_docs"], b["distinct_texts"]) == (4, 1)  # 3 exact dupes
    assert (b["p25_len"], b["p90_len"]) == (8, 8)  # all ties -> one length
    c = card["c"]
    # NULL folds to '': len 0, counted as a doc and a distinct text
    assert (c["n_docs"], c["total_chars"], c["distinct_texts"]) == (2, 3, 2)
    assert (c["p25_len"], c["p50_len"]) == (0, 0)  # rank 1 at n=2


def test_null_group_rows_are_excluded(spark):
    """NULL group keys never match the equi-joins — identically in any
    SQL engine — so they are documented as excluded from the card."""
    mixed = spark.createDataFrame(
        [("s", "abcd"), (None, "xx")], "source string, text string"
    )
    assert [r["source"] for r in corpus_profile(mixed).collect()] == ["s"]


def test_single_doc_group(spark):
    one = spark.createDataFrame([("s", "abcd")], "source string, text string")
    r = corpus_profile(one).collect()[0]
    assert (r["p25_len"], r["p50_len"], r["p75_len"], r["p90_len"]) == (4, 4, 4, 4)


def test_partition_independent(spark, docs):
    a = sorted(map(tuple, corpus_profile(docs).collect()))
    b = sorted(map(tuple, corpus_profile(docs.repartition(13)).collect()))
    assert a == b


def test_all_bigint_schema(spark, docs):
    assert [f.dataType.simpleString() for f in corpus_profile(docs).schema[1:]] == [
        "bigint"
    ] * 7


def test_plan_window_runs_over_histogram_not_raw_rows(spark, docs):
    """The quantile window's child must be the (group, length)
    aggregate — partition size bounded by distinct lengths — never the
    raw doc rows (the hot-key sort shape that melts at one giant
    source). Formatted mode: locate the Window block and check a
    HashAggregate keyed on (_g, _len) sits below it in the same detail
    listing; and the whole card is JVM-side."""
    plan = _plan(corpus_profile(docs))
    assert "Window" in plan
    agg_blocks = [
        b
        for b in re.split(r"\n\(\d+\) ", plan)
        if b.startswith("HashAggregate") and "_len" in b and "_g" in b
    ]
    assert agg_blocks, plan  # the histogram aggregate exists
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
