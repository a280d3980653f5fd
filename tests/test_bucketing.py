"""Bucketed co-located joins: the shuffle-avoidance path for repeated
big-table equi-joins at 100 TB (SURVEY §4 'bucketing for co-located
joins'). Writing both sides bucketed on the join key lets Spark plan a
sort-merge join with NO exchange on either side — the plan property this
test pins."""

import contextlib
import io
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    # tables land in the session's default warehouse dir
    # (spark-warehouse/, gitignored); dropped on teardown
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 50).alias("grp"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    meta = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("label"),
    )
    for name, df in (("bdocs", docs), ("bmeta", meta)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .format("parquet")
            .saveAsTable(name)
        )
    yield "bdocs", "bmeta"
    for name in ("bdocs", "bmeta"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(a).join(spark.table(b), "doc_id")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("simple")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # bucketing replaced the shuffle
        # and the join is still correct
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_needs_exchange(spark, bucketed_pair):
    """Control: the same join over plain parquet DOES shuffle — proving
    the bucketed plan above is the bucketing's doing."""
    a, _ = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.table(a).withColumn("x", F.lit(1)).drop("x")
        other = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            spark.table(a).join(other, "doc_id").explain("simple")
        assert "Exchange" in buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
