"""Portable HLL sketch: from-spec register parity against a pure-Python
replay of the md5 formula, dense-axis completeness, merge = direct,
NULL exclusion, accuracy envelope at three cardinalities, partition
independence, and the no-Python plan pin."""

import contextlib
import hashlib
import io
import math

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.sketch import (
    M,
    RANK_CAP,
    hll_corrected,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _py_registers(values):
    """Reference replay of the documented formula."""
    regs = {}
    for v in values:
        if v is None:
            continue
        h = hashlib.md5(v.encode()).hexdigest()
        bucket = int(h[:3], 16)
        w = int(h[3:16], 16)
        rank = min(RANK_CAP, 53 - w.bit_length()) if w else RANK_CAP
        # bit_length(0) = 0 but bin-string length of 0 is 1 -> rank 52,
        # capped; min() above covers both branches identically
        regs[bucket] = max(regs.get(bucket, 0), rank)
    return regs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "g string, v string")


def test_registers_match_pure_python(spark):
    vals = [f"doc-{i}" for i in range(500)] + ["doc-0", "doc-1", None]
    df = _docs(spark, [("a", v) for v in vals])
    got = {
        r["bucket"]: r["rank"]
        for r in hll_registers(df, "v", ["g"]).filter(F.col("rank") > 0).collect()
    }
    assert got == _py_registers(vals)


def test_dense_axis_and_null_exclusion(spark):
    df = _docs(spark, [("a", "x"), ("a", None), ("b", None)])
    regs = hll_registers(df, "v", ["g"]).collect()
    # all M buckets for BOTH groups, even group b whose only value is NULL
    assert len(regs) == 2 * M
    b_ranks = {r["rank"] for r in regs if r["g"] == "b"}
    assert b_ranks == {0}


def test_merge_equals_direct(spark):
    rows = [("a", f"v{i}") for i in range(300)]
    df = _docs(spark, rows)
    left = hll_registers(df.filter(F.substring("v", 2, 9).cast("long") % 2 == 0), "v", ["g"])
    right = hll_registers(df.filter(F.substring("v", 2, 9).cast("long") % 2 == 1), "v", ["g"])
    merged = hll_estimate(hll_merge(left, right), ["g"]).collect()[0]
    direct = hll_distinct(df, "v", ["g"]).collect()[0]
    assert (merged["v_zero"], merged["hll_units"], merged["hll_estimate"]) == (
        direct["v_zero"],
        direct["hll_units"],
        direct["hll_estimate"],
    )


@pytest.mark.parametrize("n", [40, 2000, 50_000])
def test_accuracy_envelope(spark, n):
    """Corrected estimate within 5% (3 sigma at m=4096 is ~4.9%)."""
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    row = hll_distinct(df, "v", ["g"]).collect()[0]
    est = hll_corrected(row["hll_estimate"], row["v_zero"])
    assert abs(est - n) / n < 0.05


def test_partition_independence(spark):
    rows = [("a", f"v{i % 700}") for i in range(2000)]
    a = hll_distinct(_docs(spark, rows), "v", ["g"]).collect()[0]
    b = hll_distinct(_docs(spark, rows).repartition(13), "v", ["g"]).collect()[0]
    assert a == b


def test_duplicates_do_not_move_registers(spark):
    once = hll_distinct(_docs(spark, [("a", "x"), ("a", "y")]), "v", ["g"]).collect()[0]
    many = hll_distinct(
        _docs(spark, [("a", "x")] * 50 + [("a", "y")] * 9), "v", ["g"]
    ).collect()[0]
    assert once == many


def test_plan_no_python_and_broadcast_axis(spark):
    df = _docs(spark, [("a", "x")])
    plan = _plan(hll_distinct(df, "v", ["g"]))
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
