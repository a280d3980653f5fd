"""Deequ-style one-pass data-quality audit (operators/metrics.py)."""

import pytest

from docling_translate_spark.operators.metrics import quality_audit

ROWS = [
    # id, code, size, text
    (1, "en", 10, "alpha"),
    (2, "EN", 5, "beta"),       # code fails ^[a-z]{2}$
    (2, "fr", -3, "gamma"),     # dup id, size out of [0, 100]
    (3, None, 200, None),       # null code+text, size out of range
    (4, "de", 50, "delta"),
    (4, "xx", 60, "epsilon"),   # dup id, code outside set
]
SCHEMA = "id long, code string, size long, text string"

RULES = [
    ("not_null", "text_present", "text"),
    ("unique", "id_unique", "id"),
    ("in_range", "size_range", "size", 0, 100),
    ("matches", "code_shape", "code", "^[a-z]{2}$"),
    ("in_set", "code_known", "code", ["en", "fr", "de"]),
    ("check", "text_len", "size = length(text) * 10"),
]


def _audit(spark, rows, rules=RULES):
    df = spark.createDataFrame(rows, SCHEMA)
    out = quality_audit(df, rules)
    got = {r["rule_id"]: (r["n_violations"], r["n_rows"]) for r in out.collect()}
    assert len(got) == len(rules)
    return got


def test_hand_counts(spark):
    got = _audit(spark, ROWS)
    n = len(ROWS)
    assert got["text_present"] == (1, n)   # row 3
    assert got["id_unique"] == (2, n)      # 6 non-null ids, 4 distinct
    assert got["size_range"] == (2, n)     # -3 and 200
    assert got["code_shape"] == (1, n)     # "EN" (nulls not counted)
    assert got["code_known"] == (2, n)     # "EN", "xx"
    # text_len: only id=1 (10 = 5*10... no: len('alpha')*10 = 50) —
    # recompute: sizes 10,5,-3,200,50,60 vs len*10 = 50,40,50,NULL,50,70
    # => only id=4/'delta' (50 = 50) passes; NULL expr (row 3) violates
    assert got["text_len"] == (5, n)


def test_all_pass_and_zero_rows(spark):
    clean = [(1, "en", 10, "a")]  # size = length(text) * 10 holds
    got = _audit(spark, clean)
    assert all(v == (0, 1) for v in got.values())
    empty = _audit(spark, [])
    assert all(v == (0, 0) for v in empty.values())


def test_validation(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="duplicate"):
        quality_audit(df, [("not_null", "a", "text"), ("unique", "a", "id")])
    with pytest.raises(ValueError, match="unknown"):
        quality_audit(df, [("frobnicate", "a", "text")])
    with pytest.raises(ValueError, match="at least one"):
        quality_audit(df, [])


def test_partitioning_invariance_and_plan(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    a = {r["rule_id"]: r["n_violations"]
         for r in quality_audit(df.repartition(1), RULES).collect()}
    b = {r["rule_id"]: r["n_violations"]
         for r in quality_audit(df.repartition(5), RULES).collect()}
    assert a == b
    plan = (
        quality_audit(df, RULES)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    # one aggregation pass: partial aggs below the single-row exchange
    assert "partial" in plan.lower()
