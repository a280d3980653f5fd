"""A-ES weighted sampling without replacement: exact parity with a
pure-Python replication of the md5-uniform draw, weight monotonicity,
ineligible-row exclusion, under-full inputs, and determinism.
"""

import contextlib
import hashlib
import io
import math

import pytest

from docling_translate_spark.operators.sampling import weighted_sample


def _py_key_nano(doc_id, w):
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    u = float(h + 1) / float(1 << 60)
    return round(math.log(u) / w * 1e9)


def _py_sample(rows, n):
    keyed = [
        (did, w, _py_key_nano(did, w))
        for did, w in rows
        if w is not None and w > 0
    ]
    keyed.sort(key=lambda t: (-t[2], t[0]))
    return [(did, k) for did, w, k in keyed[:n]]


def test_python_reference_parity(spark):
    rows = [(i, float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        (r["doc_id"], r["key_nano"])
        for r in weighted_sample(df, 25, "w").orderBy("rank").collect()
    ]
    assert got == _py_sample(rows, 25)


def test_weight_monotonicity(spark):
    # a row's key strictly improves as its weight grows (same u):
    # sample the same ids at weight 1 vs weight 100 — the heavy run's
    # minimum selected key beats the light run's
    rows1 = [(i, 1.0) for i in range(300)]
    rows2 = [(i, 100.0) for i in range(300)]
    d1 = spark.createDataFrame(rows1, "doc_id long, w double")
    d2 = spark.createDataFrame(rows2, "doc_id long, w double")
    k1 = min(r["key_nano"] for r in weighted_sample(d1, 30, "w").collect())
    k2 = min(r["key_nano"] for r in weighted_sample(d2, 30, "w").collect())
    assert k2 > k1
    # with uniform weights the selection is the same id set either way
    ids1 = {r["doc_id"] for r in weighted_sample(d1, 30, "w").collect()}
    ids2 = {r["doc_id"] for r in weighted_sample(d2, 30, "w").collect()}
    assert ids1 == ids2


def test_heavy_rows_overrepresented(spark):
    # half the ids carry 50x weight: they should dominate the sample
    rows = [(i, 50.0 if i % 2 == 0 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = [r["doc_id"] for r in weighted_sample(df, 100, "w").collect()]
    heavy = sum(1 for d in picked if d % 2 == 0)
    assert heavy > 80


def test_ineligible_rows_excluded(spark):
    rows = [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample(df, 10, "w").collect()
    assert sorted(r["doc_id"] for r in out) == [1, 5]
    assert sorted(r["rank"] for r in out) == [1, 2]


def test_underfull_returns_all(spark):
    df = spark.createDataFrame([(1, 1.0)], "doc_id long, w double")
    out = weighted_sample(df, 99, "w").collect()
    assert len(out) == 1 and out[0]["rank"] == 1


def test_partitioning_invariance(spark):
    rows = [(i, float(1 + i % 5)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = [tuple(r) for r in weighted_sample(df, 40, "w").orderBy("rank").collect()]
    b = [
        tuple(r)
        for r in weighted_sample(df.repartition(13), 40, "w")
        .orderBy("rank")
        .collect()
    ]
    assert a == b


def test_param_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "doc_id long, w double")
    with pytest.raises(ValueError):
        weighted_sample(df, 0, "w")


def test_plan_is_take_ordered(spark):
    rows = [(i, 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        weighted_sample(df, 5, "w").explain("simple")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
