"""Cross-source shingle-overlap matrix: hand-computed shared counts and
exact-integer Jaccard, the max_sources stop cap, short-doc shingles,
NULL handling, and the all-integer output contract.
"""

import contextlib
import io

import pytest

from docling_translate_spark.operators.text_analysis import source_overlap

SCHEMA = "source string, text string"


@pytest.fixture(scope="module")
def overlap(spark):
    rows = [
        ("a", "the quick brown fox jumps"),   # shingles: 3 (len5, n3)
        ("a", "alpha beta gamma"),
        ("b", "the quick brown fox sleeps"),  # shares 2 shingles with a
        ("b", "unrelated content entirely here"),
        ("c", "alpha beta gamma"),            # shares 1 shingle with a
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = source_overlap(df, n=3, max_sources=100)
    return {(r["source_a"], r["source_b"]): r.asDict() for r in out.collect()}


def test_shared_counts(overlap):
    # a: {tqb, qbf, bfj, abg} n=4
    # b: {tqb, qbf, bfs} + {uce, ceh} (4 tokens → 2 shingles) n=5
    ab = overlap[("a", "b")]
    assert ab["shared_shingles"] == 2
    assert (ab["n_a"], ab["n_b"]) == (4, 5)
    ac = overlap[("a", "c")]
    assert ac["shared_shingles"] == 1
    assert ac["n_b"] == 1


def test_exact_integer_jaccard(overlap):
    ab = overlap[("a", "b")]
    # 2 / (4 + 5 - 2) → exact integer micro division
    assert ab["jaccard_micro"] == 2 * 1000000 // 7
    ac = overlap[("a", "c")]
    assert ac["jaccard_micro"] == 1 * 1000000 // 4


def test_no_pair_without_overlap(overlap):
    assert ("b", "c") not in overlap


def test_stop_cap_drops_ubiquitous_shingles(spark):
    # one shingle present in ALL four sources + a rare pair-only one;
    # with max_sources=3 the ubiquitous shingle is dropped, so only
    # the rare pair remains
    rows = [
        ("a", "common everywhere phrase"),
        ("b", "common everywhere phrase"),
        ("c", "common everywhere phrase"),
        ("d", "common everywhere phrase rare leak marker"),
        ("a", "rare leak marker"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r["source_a"], r["source_b"]): r["shared_shingles"]
        for r in source_overlap(df, n=3, max_sources=3).collect()
    }
    assert out == {("a", "d"): 1}


def test_mirror_invariant_under_cap(spark):
    # identical mirror sources score jaccard 10^6 even when part of
    # their content is capped boilerplate (POST-cap totals — the
    # informative_shingles consistent-filtering discipline)
    mirror = "common everywhere phrase plus unique mirror content here"
    rows = [("m1", mirror), ("m2", mirror)] + [
        (s, "common everywhere phrase") for s in ("x", "y", "z", "w")
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in source_overlap(df, n=3, max_sources=3).collect()
    }
    m = out[("m1", "m2")]
    assert m["jaccard_micro"] == 1000000
    assert m["n_a"] == m["n_b"] == m["shared_shingles"]


def test_short_docs_whole_string_shingle(spark):
    rows = [("a", "tiny doc"), ("b", "tiny doc"), ("c", "other")]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in source_overlap(df, n=3).collect()
    }
    assert out[("a", "b")]["shared_shingles"] == 1
    assert out[("a", "b")]["jaccard_micro"] == 1000000


def test_null_source_and_text(spark):
    rows = [(None, "x y z w"), ("a", None), ("a", "x y z w"), ("b", "x y z w")]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in source_overlap(df, n=3).collect()
    }
    # NULL source excluded; NULL text contributes nothing
    assert list(out) == [("a", "b")]
    assert out[("a", "b")]["n_a"] == 2


def test_types_and_params(spark):
    df = spark.createDataFrame([("a", "x y z")], SCHEMA)
    out = source_overlap(df)
    for f in out.schema.fields:
        assert f.dataType.simpleString() in ("string", "bigint"), f
    with pytest.raises(ValueError):
        source_overlap(df, n=0)
    with pytest.raises(ValueError):
        source_overlap(df, max_sources=1)


def test_plan_jvm_side(spark):
    df = spark.createDataFrame([("a", "x y z"), ("b", "x y z")], SCHEMA)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        source_overlap(df).explain("simple")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan
