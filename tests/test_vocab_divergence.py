"""Smoothed-unigram KL drift between two corpora: hand-computed
contributions/ranks, drift detection on injected vocabulary, zero
self-divergence, empty corpora, and plan/typing disciplines.
"""

import contextlib
import io
import math

import pytest

from docling_translate_spark.operators.text_analysis import vocab_divergence


def _nano(c_a, c_b, na, nb, v):
    pa = (c_a + 1) / (na + v)
    pb = (c_b + 1) / (nb + v)
    return round(pa * math.log(pa / pb) * 1e9)


@pytest.fixture(scope="module")
def simple(spark):
    a = spark.createDataFrame([("x x y",)], "text string")
    b = spark.createDataFrame([("x z",)], "text string")
    return {r["term"]: r.asDict() for r in vocab_divergence(a, b, k=10).collect()}


def test_hand_computed_contributions(simple):
    # ca: x2 y1, cb: x1 z1, Na=3 Nb=2 V=3
    assert simple["x"]["contrib_nano"] == _nano(2, 1, 3, 2, 3)
    assert simple["y"]["contrib_nano"] == _nano(1, 0, 3, 2, 3)
    assert simple["z"]["contrib_nano"] == _nano(0, 1, 3, 2, 3)
    assert simple["z"]["contrib_nano"] < 0


def test_kl_total_and_ranks(simple):
    total = sum(r["contrib_nano"] for r in simple.values())
    assert all(r["kl_total_nano"] == total for r in simple.values())
    # y's over-representation beats x's, z is negative → last
    assert [t for t, r in sorted(simple.items(), key=lambda kv: kv[1]["rank"])] == [
        "y",
        "x",
        "z",
    ]
    assert simple["y"]["c_a"] == 1 and simple["y"]["c_b"] == 0


def test_detects_injected_drift(spark):
    base = [("common words here",)] * 20
    a = spark.createDataFrame(base + [("common words here driftterm",)] * 5, "text string")
    b = spark.createDataFrame(base, "text string")
    top = vocab_divergence(a, b, k=1).collect()[0]
    assert top["term"] == "driftterm"
    assert top["c_b"] == 0


def test_self_divergence_is_zero(spark):
    a = spark.createDataFrame([("alpha beta",), ("beta gamma",)], "text string")
    out = vocab_divergence(a, a, k=5).collect()
    assert all(r["contrib_nano"] == 0 for r in out)
    assert all(r["kl_total_nano"] == 0 for r in out)


def test_empty_corpora(spark):
    # vs an empty B, the smoothed B distribution is uniform over A's
    # vocab — KL is positive as soon as A is non-uniform (a single-term
    # A is a point mass on both sides: KL exactly 0, by construction)
    a = spark.createDataFrame([("alpha beta beta",)], "text string")
    e = spark.createDataFrame([("   ",), (None,)], "text string")
    out = vocab_divergence(a, e, k=5).collect()
    assert len(out) == 2
    assert out[0]["kl_total_nano"] > 0
    assert min(r["rank"] for r in out) == 1
    assert [r["term"] for r in sorted(out, key=lambda r: r["rank"])][0] == "beta"
    # both empty: no rows, no crash
    assert vocab_divergence(e, e, k=5).count() == 0


def test_types_all_long_or_string(spark):
    a = spark.createDataFrame([("x",)], "text string")
    out = vocab_divergence(a, a, k=1)
    for f in out.schema.fields:
        assert f.dataType.simpleString() in ("string", "bigint"), f


def test_plan_disciplines(spark):
    a = spark.createDataFrame([("x y",)], "text string")
    b = spark.createDataFrame([("y z",)], "text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        vocab_divergence(a, b, k=3).explain("simple")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the totals and KL rows attach via 1-row broadcasts; the top-k cut
    # is a TakeOrdered, never a global sort
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_param_validation(spark):
    a = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        vocab_divergence(a, a, k=0)
