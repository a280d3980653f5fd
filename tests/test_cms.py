"""Portable count-min sketch (operators/sketch.py).

Family contract shared with HLL/Bloom: md5-nibble positions, exact
BIGINT counters, bit-identical across engines and parallelism levels.
"""

import pytest
from pyspark.sql import functions as F

from docling_translate_spark.operators.sketch import (
    CMS_D,
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
)


def _tok_df(spark, toks):
    return spark.createDataFrame([(i, t) for i, t in enumerate(toks)], "i long, tok string")


CORPUS = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d", "e", "f", None]


def _est_map(spark, df, d=CMS_D):
    sk = cms_build(df, "tok", d=d)
    cand = df.select("tok").distinct()
    out = cms_estimate(cand, sk, "tok", d=d).collect()
    return {r.tok: r.cms_count for r in out}


def test_never_underestimates_and_exact_when_sparse(spark):
    df = _tok_df(spark, CORPUS)
    got = _est_map(spark, df)
    true = {"a": 5, "b": 3, "c": 2, "d": 1, "e": 1, "f": 1}
    for t, n in true.items():
        assert got[t] >= n
    # 6 distinct values in 2^16 columns: collisions are (md5-)impossible
    assert {t: got[t] for t in true} == true


def test_null_values_insert_nothing_and_estimate_zero(spark):
    df = _tok_df(spark, CORPUS)
    sk = cms_build(df, "tok")
    # total inserted weight per row = non-null occurrences
    per_row = (
        sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    )
    assert all(r.s == 13 for r in per_row) and len(per_row) == CMS_D
    assert _est_map(spark, df)[None] == 0


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("x", 10), ("x", 5), ("y", 2), ("z", None)],
        "tok string, w long",
    )
    sk = cms_build(df, "tok", weight_col="w")
    got = {
        r.tok: r.cms_count
        for r in cms_estimate(df.select("tok").distinct(), sk, "tok").collect()
    }
    assert got == {"x": 15, "y": 2, "z": 0}


def test_merge_equals_build_over_union(spark):
    a, b = _tok_df(spark, CORPUS[:6]), _tok_df(spark, CORPUS[6:])
    merged = cms_merge(cms_build(a, "tok"), cms_build(b, "tok"))
    whole = cms_build(_tok_df(spark, CORPUS), "tok")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_d_mismatch_raises(spark):
    df = _tok_df(spark, CORPUS)
    sk = cms_build(df, "tok", d=3)
    with pytest.raises(ValueError):
        cms_estimate(df, sk, "tok", d=4)
    with pytest.raises(ValueError):
        cms_merge(cms_build(df, "tok", d=3), cms_build(df, "tok", d=4))


def test_heavy_hitters_superset(spark):
    df = _tok_df(spark, CORPUS)
    hh = {r.tok for r in cms_heavy_hitters(df, "tok", min_count=2).collect()}
    assert {"a", "b", "c"} <= hh
    assert "d" not in hh or True  # collisions may admit extras, never drop


def test_grouped_sketch_with_null_group(spark):
    df = spark.createDataFrame(
        [("g1", "x"), ("g1", "x"), (None, "x"), (None, "y")],
        "g string, tok string",
    )
    sk = cms_build(df, "tok", group_cols=("g",))
    got = {
        (r.g, r.tok): r.cms_count
        for r in cms_estimate(
            df.select("g", "tok").distinct(), sk, "tok", group_cols=("g",)
        ).collect()
    }
    assert got == {("g1", "x"): 2, (None, "x"): 1, (None, "y"): 1}


def test_estimate_plan_is_broadcast_only(spark):
    df = _tok_df(spark, CORPUS)
    sk = cms_build(df, "tok")
    plan = (
        cms_estimate(df.select("tok").distinct(), sk, "tok")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the candidate side must never shuffle for the probe: all d cell
    # joins are broadcast, no shuffle join anywhere in the decoration
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") == CMS_D
