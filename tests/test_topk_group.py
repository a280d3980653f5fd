"""Salted two-phase per-group top-k (operators/retrieval.py)."""

import pytest

from docling_translate_spark.operators.retrieval import topk_per_group

ROWS = [
    # grp, id, score
    ("a", 1, 10.0),
    ("a", 2, 30.0),
    ("a", 3, 30.0),   # tie with id 2 -> id 2 first
    ("a", 4, None),   # NULL never outranks a value
    ("a", 5, 20.0),
    ("b", 6, 1.0),
    ("b", 7, 2.0),
    ("c", 8, 5.0),    # group smaller than k
]
SCHEMA = "grp string, id long, score double"


def _run(spark, k, salt_buckets, rows=ROWS, ascending=False):
    df = spark.createDataFrame(rows, SCHEMA)
    res = topk_per_group(
        df, ["grp"], "score", k, ["id"],
        salt_buckets=salt_buckets, ascending=ascending,
    ).collect()
    out = {}
    for r in sorted(res, key=lambda r: (r["grp"], r["rank"])):
        out.setdefault(r["grp"], []).append((r["id"], r["rank"]))
    return out


def test_topk_desc(spark):
    got = _run(spark, k=2, salt_buckets=4)
    assert got == {"a": [(2, 1), (3, 2)], "b": [(7, 1), (6, 2)],
                   "c": [(8, 1)]}


def test_topk_asc_and_null_last(spark):
    got = _run(spark, k=3, salt_buckets=4, ascending=True)
    assert got["a"] == [(1, 1), (5, 2), (2, 3)]  # 10 < 20 < 30; NULL last
    got_all = _run(spark, k=10, salt_buckets=4)
    assert got_all["a"][-1] == (4, 5)  # NULL score ranks last


def test_salt_invariance(spark):
    assert _run(spark, 2, 1) == _run(spark, 2, 7) == _run(spark, 2, 64)


def test_validation(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError):
        topk_per_group(df, ["grp"], "score", 0, ["id"])
    with pytest.raises(ValueError):
        topk_per_group(df, ["grp"], "score", 2, [])
    with pytest.raises(ValueError):
        topk_per_group(df, ["grp"], "score", 2, ["id"], salt_buckets=0)


def test_phase1_window_is_salted(spark):
    """The first window partitions on (group, salt): a hot group's sort
    spreads over salt_buckets tasks instead of one."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = (
        topk_per_group(df, ["grp"], "score", 2, ["id"], salt_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert any("_salt" in ln for ln in windows)
