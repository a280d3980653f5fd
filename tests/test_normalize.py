"""CCNet-style dedup-key normalization (operators/text_analysis.py).

Every expected string is hand-derived from the documented rule ladder
(lowercase → accent fold → digit→0 → punct strip → whitespace collapse
→ trim); the driver-gate DuckDB oracle replays the same ladder from
the SAME module constants, so these fixtures pin the semantics
readably.
"""

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.text_analysis import (
    ACCENT_DST,
    ACCENT_SRC,
    norm_fingerprint,
    normalize_text_col,
)


def _norm(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        r.n for r in df.select(normalize_text_col(F.col("text")).alias("n")).collect()
    ]


def test_accent_map_is_aligned_and_folds_to_ascii():
    assert len(ACCENT_SRC) == len(ACCENT_DST)
    assert len(set(ACCENT_SRC)) == len(ACCENT_SRC)
    assert all(ord(c) < 128 for c in ACCENT_DST)


@pytest.mark.parametrize(
    "raw,expected",
    [
        # lowercase + trailing punct + digit runs
        ("  Héllo,  WÖRLD!! 2024 ", "hello world 0000"),
        # smart quotes / em-en dashes / ellipsis / middle dot all strip
        ("«Smart “quotes” — and… dashes–» ·", "smart quotes and dashes"),
        # uppercase accents reach the fold via lower() first
        ("ÉÀÇÜÑ naïve café's", "eacun naive cafes"),
        # every whitespace flavor collapses to one space
        ("tabs\tand\nnewlines\r\n ok 7", "tabs and newlines ok 0"),
        # ß→s (1:1 translate, pinned), đ/Đ→d
        ("ß straße — Đorđe's 99 problems", "s strase dordes 00 problems"),
        # intra-word hyphen strips WITHOUT inserting a space (CCNet)
        ("no-change plain text", "nochange plain text"),
        ("", ""),
        ("   \t ", ""),
    ],
)
def test_normalize_fixtures(spark, raw, expected):
    assert _norm(spark, [raw]) == [expected]


def test_null_text_stays_null(spark):
    assert _norm(spark, [None]) == [None]


def test_idempotent(spark):
    raws = ["  Héllo,  WÖRLD!! 2024 ", "«x» — 9", "plain"]
    once = _norm(spark, raws)
    twice = _norm(spark, once)
    assert once == twice


def test_representation_variants_collapse(spark):
    """Case, digits, punctuation chrome, and accents are exactly the
    differences the normalized key must erase."""
    variants = [
        "The quick fox, 2024!",
        "the QUICK fox 1999",
        "«thé quîck fóx» … 5280",
    ]
    fps = (
        norm_fingerprint(
            spark.createDataFrame([(t,) for t in variants], "text string")
        )
        .select("norm_fp")
        .collect()
    )
    assert len({r.norm_fp for r in fps}) == 1


def test_distinct_content_stays_distinct(spark):
    fps = (
        norm_fingerprint(
            spark.createDataFrame(
                [("alpha beta",), ("alpha gamma",)], "text string"
            )
        )
        .select("norm_fp")
        .collect()
    )
    assert len({r.norm_fp for r in fps}) == 2


def test_norm_fingerprint_adds_both_columns(spark):
    df = norm_fingerprint(
        spark.createDataFrame([("A  b 3!",)], "text string")
    )
    row = df.collect()[0]
    assert row.norm_text == "a b 0"
    assert len(row.norm_fp) == 32


def test_zero_shuffle_plan(spark):
    """The normalizer is a pure projection: no exchange in the plan."""
    df = spark.createDataFrame([("x",)], "text string")
    plan = (
        df.select(normalize_text_col(F.col("text")).alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
