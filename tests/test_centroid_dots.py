"""Per-group embedding-centroid inner products: parity with a
pure-Python replication of the quantize → milli-mean → integer-dot
pipeline, self-dot consistency, NULL handling, and the all-BIGINT
contract.
"""

import contextlib
import io
import math

import pytest

from docling_translate_spark.operators.similarity import group_centroid_dots

SCHEMA = "source string, embedding array<float>"


def _py_milli_means(vectors, scale=1024):
    n = len(vectors)
    dims = len(vectors[0])
    out = []
    for d in range(dims):
        s = sum(math.floor(float(v[d]) * scale + 0.5) for v in vectors)
        # Spark `div` truncates toward zero; all test sums stay >= 0
        out.append(int(s * 1000 // n) if s >= 0 else -int((-s) * 1000 // n))
    return out


def test_python_reference_parity(spark):
    groups = {
        "a": [[0.5, -0.25, 1.0], [0.75, 0.0, 0.5]],
        "b": [[-0.5, 0.25, 0.0], [0.0, 1.0, -1.0], [0.25, 0.25, 0.25]],
        "c": [[1.0, 1.0, 1.0]],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in group_centroid_dots(df).collect()
    }
    means = {g: _py_milli_means(vs) for g, vs in groups.items()}
    for (ga, gb), r in got.items():
        expect = sum(x * y for x, y in zip(means[ga], means[gb]))
        assert r["dot_ab"] == expect, (ga, gb)
        assert r["dot_aa"] == sum(x * x for x in means[ga])
        assert r["dot_bb"] == sum(x * x for x in means[gb])
        assert (r["n_a"], r["n_b"]) == (len(groups[ga]), len(groups[gb]))
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}


def test_identical_groups_cosine_one(spark):
    vecs = [[0.5, 0.5, -0.25], [1.0, -1.0, 0.0]]
    rows = [("a", v) for v in vecs] + [("b", v) for v in vecs]
    df = spark.createDataFrame(rows, SCHEMA)
    r = group_centroid_dots(df).collect()[0]
    # identical centroids: dot_ab == dot_aa == dot_bb → cosine exactly 1
    assert r["dot_ab"] == r["dot_aa"] == r["dot_bb"]


def test_orthogonal_groups(spark):
    rows = [("a", [1.0, 0.0]), ("b", [0.0, 1.0])]
    df = spark.createDataFrame(rows, SCHEMA)
    r = group_centroid_dots(df).collect()[0]
    assert r["dot_ab"] == 0
    assert r["dot_aa"] > 0 and r["dot_bb"] > 0


def test_null_rows_excluded(spark):
    rows = [("a", [1.0]), (None, [9.0]), ("b", None), ("b", [1.0])]
    df = spark.createDataFrame(rows, SCHEMA)
    out = group_centroid_dots(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("a", "b")
    assert (r["n_a"], r["n_b"]) == (1, 1)


def test_partitioning_invariance_and_types(spark):
    rows = [
        (f"g{i % 4}", [float(i % 7) / 7, float(i % 5) / 5 - 0.5])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, group_centroid_dots(df).collect()))
    b = sorted(map(tuple, group_centroid_dots(df.repartition(11)).collect()))
    assert a == b
    out = group_centroid_dots(df)
    for f in out.schema.fields:
        assert f.dataType.simpleString() in ("string", "bigint"), f


def test_param_validation_and_plan(spark):
    df = spark.createDataFrame([("a", [1.0]), ("b", [0.5])], SCHEMA)
    with pytest.raises(ValueError):
        group_centroid_dots(df, scale=0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        group_centroid_dots(df).explain("simple")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan
