"""Incremental snapshot dedup: within-batch exact, exact-vs-snapshot,
cross-corpus near-dup, hash-only snapshot path, determinism."""

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.dedup import dedup_incremental

SEEN_TXT = "alpha beta gamma delta epsilon zeta eta theta"
NEAR_TXT = SEEN_TXT + " iota"  # shares 6 of 7 shingles -> j = 6/7
FRESH_TXT = "one two three four five six seven"


@pytest.fixture(scope="module")
def corpora(spark):
    seen = spark.createDataFrame(
        [(1, SEEN_TXT), (2, "completely different snapshot doc here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, FRESH_TXT),  # admit
            (11, FRESH_TXT),  # within-batch dup of 10 -> drop (min id wins)
            (12, SEEN_TXT),  # exact copy of snapshot -> drop
            (13, NEAR_TXT),  # near-dup of snapshot -> drop at 0.8
            (14, "unrelated brand new content entirely fresh words"),  # admit
        ],
        "doc_id long, text string",
    )
    return batch, seen


def test_three_stages(spark, corpora):
    batch, seen = corpora
    got = {r["doc_id"] for r in dedup_incremental(batch, seen).collect()}
    assert got == {10, 14}


def test_near_dup_off_keeps_near_dups(spark, corpora):
    batch, seen = corpora
    got = {
        r["doc_id"]
        for r in dedup_incremental(batch, seen, near_dup=False).collect()
    }
    assert got == {10, 13, 14}


def test_threshold_controls_near_dup(spark, corpora):
    batch, seen = corpora
    # j(13 vs 1) = 6/7 ≈ 0.857: admitted above it, dropped below it
    got = {
        r["doc_id"]
        for r in dedup_incremental(batch, seen, threshold=0.9).collect()
    }
    assert 13 in got


def test_hash_only_snapshot(spark, corpora):
    batch, seen = corpora
    hashes = seen.select(F.md5("text").alias("text_hash"))
    got = {
        r["doc_id"]
        for r in dedup_incremental(batch, hashes, near_dup=False).collect()
    }
    assert got == {10, 13, 14}
    with pytest.raises(ValueError, match="hash-only"):
        dedup_incremental(batch, hashes, near_dup=True)


def test_null_text_rows_never_admitted(spark, corpora):
    """md5(NULL) is NULL; the stage-1 fingerprint semi-join uses
    standard equality, so textless rows drop — the documented ingest
    behavior, identical in any SQL engine."""
    _, seen = corpora
    batch = spark.createDataFrame(
        [(20, None), (21, FRESH_TXT)], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in dedup_incremental(batch, seen).collect()}
    assert got == {21}


def test_plan_no_python_no_window(spark, corpora):
    """Every stage is joins/aggs on column expressions: no Python
    eval nodes and no Window anywhere (the within-batch exact stage is
    the arg-min groupBy, not a rank)."""
    import contextlib
    import io

    batch, seen = corpora
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dedup_incremental(batch, seen).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan


def test_columns_pass_through_and_deterministic(spark, corpora):
    batch, seen = corpora
    wide = batch.withColumn("extra", F.col("doc_id") * 2)
    a = sorted(map(tuple, dedup_incremental(wide, seen).collect()))
    b = sorted(
        map(
            tuple,
            dedup_incremental(
                wide.repartition(7), seen.repartition(3)
            ).collect(),
        )
    )
    assert a == b
    assert {c for c in dedup_incremental(wide, seen).columns} == {
        "doc_id",
        "text",
        "extra",
    }
