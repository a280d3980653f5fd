"""Snapshot diff / churn (operators/metrics.py)."""

from docling_translate_spark.operators.metrics import (
    DIFF_STATUSES,
    snapshot_churn,
    snapshot_diff,
)

OLD = [
    (1, "alpha"),
    (2, "beta"),
    (3, None),       # NULL content, stays NULL -> unchanged
    (4, "delta"),    # removed
    (5, "eps"),      # becomes NULL -> changed
]
NEW = [
    (1, "alpha"),        # unchanged
    (2, "beta v2"),      # changed
    (3, None),           # unchanged (NULL == NULL)
    (5, None),           # changed (value -> NULL)
    (6, "fresh"),        # added
]
SCHEMA = "doc_id long, text string"


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_diff_statuses(spark):
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(_mk(spark, OLD), _mk(spark, NEW)).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",
        4: "removed",
        5: "changed",
        6: "added",
    }


def test_churn_complete_axis(spark):
    got = {
        r["status"]: r["n_docs"]
        for r in snapshot_churn(_mk(spark, OLD), _mk(spark, NEW)).collect()
    }
    assert got == {"added": 1, "removed": 1, "changed": 2, "unchanged": 2}
    # identical snapshots: zero counts still present for every status
    same = {
        r["status"]: r["n_docs"]
        for r in snapshot_churn(_mk(spark, OLD), _mk(spark, OLD)).collect()
    }
    assert set(same) == set(DIFF_STATUSES)
    assert same == {"added": 0, "removed": 0, "changed": 0, "unchanged": 5}


def test_multi_column_content(spark):
    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "doc_id long, t1 string, t2 string"
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "z")], "doc_id long, t1 string, t2 string"
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new, content_cols=("t1", "t2")).collect()
    }
    assert got == {1: "unchanged", 2: "changed"}


def test_slim_join_plan(spark):
    """The text payload never shuffles: only (id, digest) rows reach
    the join exchanges."""
    out = snapshot_diff(_mk(spark, OLD), _mk(spark, NEW))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # digests are computed below the exchange; the raw text column
    # must not appear in any exchange's output schema
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line
