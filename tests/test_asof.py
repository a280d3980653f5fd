"""As-of join: hand-computed fixtures (inclusive backward match,
cross-bucket carry, no-match NULLs), deterministic tie handling,
tolerance, the reserved-column guard, partition independence, and the
bounded-partition plan shape (event-level window keyed by (key,
bucket); key-only window touches only slim bucket summaries)."""

import contextlib
import io
import re

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.asof import asof_join

US = 1_000_000  # micros per second


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _probe(spark, rows):
    return spark.createDataFrame(rows, "pid long, k long, ts long")


def _build(spark, rows):
    return spark.createDataFrame(rows, "k long, ts long, v long")


def _run(probe, build, **kw):
    out = asof_join(probe, build, "k", "ts", ["v"], **kw)
    return {r["pid"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}


def test_hand_computed_matches(spark):
    """Inclusive backward semantics inside one bucket."""
    probe = _probe(spark, [(1, 1, 50), (2, 1, 15), (3, 1, 5), (4, 2, 100), (5, 3, 7)])
    build = _build(spark, [(1, 10, 111), (1, 20, 222), (2, 100, 333)])
    got = _run(probe, build, bucket_width=1000)
    assert got == {
        1: (20, 222),  # latest <= 50
        2: (10, 111),  # between the two builds
        3: (None, None),  # before any build
        4: (100, 333),  # equal ts matches (inclusive)
        5: (None, None),  # key with no build side
    }


def test_carry_across_buckets(spark):
    """A probe whose bucket has no build rows takes the running latest
    from ALL preceding buckets, including across empty gaps."""
    probe = _probe(spark, [(1, 1, 10 * US), (2, 1, 9999 * US)])
    build = _build(spark, [(1, 1 * US, 7)])
    # 1s buckets: probe 1 is 9 buckets after the build, probe 2 ~10^4
    got = _run(probe, build, bucket_width=US)
    assert got == {1: (1 * US, 7), 2: (1 * US, 7)}


def test_bucket_width_invariance(spark):
    """The result is a pure function of the data — bucket_width is a
    physical knob only."""
    import random

    rng = random.Random(7)
    probe = _probe(spark, [(i, rng.randrange(3), rng.randrange(10_000)) for i in range(200)])
    build = _build(
        spark, [(rng.randrange(3), rng.randrange(10_000), i) for i in range(80)]
    )
    a = _run(probe, build, bucket_width=10)
    b = _run(probe, build, bucket_width=1_000_000)
    assert a == b


def test_build_tie_at_same_ts_is_deterministic(spark):
    """Two build rows at the same (key, ts) resolve by max(payload
    struct) — the documented pre-aggregation — at any parallelism."""
    probe = _probe(spark, [(1, 1, 10)])
    build = _build(spark, [(1, 10, 5), (1, 10, 9)])
    assert _run(probe, build, bucket_width=100) == {1: (10, 9)}
    assert _run(probe.repartition(7), build.repartition(5), bucket_width=100) == {
        1: (10, 9)
    }


def test_tolerance_nulls_stale_matches(spark):
    probe = _probe(spark, [(1, 1, 100), (2, 1, 1000)])
    build = _build(spark, [(1, 90, 1)])
    got = _run(probe, build, bucket_width=50, tolerance=20)
    assert got == {1: (90, 1), 2: (None, None)}  # 910 > 20 -> stale


def test_probe_rows_always_survive(spark):
    probe = _probe(spark, [(i, i % 5, i) for i in range(100)])
    build = _build(spark, [(0, 0, 0)])
    out = asof_join(probe, build, "k", "ts", ["v"], bucket_width=10)
    assert out.count() == 100
    assert set(out.columns) == {"pid", "k", "ts", "asof_ts", "asof_v"}


def test_reserved_columns_raise(spark):
    probe = _probe(spark, [(1, 1, 1)]).withColumn("asof_x", F.lit(1))
    build = _build(spark, [(1, 1, 1)])
    with pytest.raises(ValueError, match="reserved"):
        asof_join(probe, build, "k", "ts", ["v"])


def test_timestamp_ntz_input(spark):
    """The events-table path: TIMESTAMP_NTZ micros are tz-free."""
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        probe = spark.createDataFrame(
            [(1, 1, "2024-01-01 00:00:10.500000")], "pid long, k long, s string"
        ).select("pid", "k", F.col("s").cast("timestamp_ntz").alias("ts"))
        build = spark.createDataFrame(
            [(1, "2024-01-01 00:00:10.400000", 42)], "k long, s string, v long"
        ).select("k", F.col("s").cast("timestamp_ntz").alias("ts"), "v")
        got = asof_join(probe, build, "k", "ts", ["v"]).collect()[0]
        assert (got["asof_ts"], got["asof_v"]) == (1704067210400000, 42)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_plan_bounded_partitions(spark):
    """Scale-shape pins: (a) the event-level window partitions by BOTH
    key and bucket — never key alone over event rows; (b) the only
    key-alone window runs over the slim bucket summaries (its input
    carries no probe columns); (c) no Python appears in the plan."""
    probe = _probe(spark, [(1, 1, 1)])
    build = _build(spark, [(1, 1, 1)])
    plan = _plan(asof_join(probe, build, "k", "ts", ["v"], bucket_width=10))
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
    # every Window node lists its partition spec; the event-level one
    # must carry both _aj_k and _aj_b
    windows = re.findall(r"Window \[.*?\]", _plan(
        asof_join(probe, build, "k", "ts", ["v"], bucket_width=10), "extended"
    ))
    assert windows, "expected window nodes in the plan"
    key_only = [w for w in windows if "_aj_b" not in w]
    # the carry window is key-only BY DESIGN but runs over summaries:
    # its frame must reference _aj_mx (the summary struct), never _aj_pay
    for w in key_only:
        assert "_aj_mx" in w, f"key-only window over event rows: {w}"
