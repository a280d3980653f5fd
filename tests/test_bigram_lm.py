"""Stupid-backoff bigram LM (Brants et al. 2007): train = pure counts,
score = joins. Hand-computed fixtures cover the seen-bigram path, the
unseen-bigram backoff, the OOV floor, short documents, and the
in-corpus no-backoff invariant; plan pins keep everything JVM-side with
a broadcast totals row.
"""

import contextlib
import io
import math

import pytest

from docling_translate_spark.operators.text_analysis import (
    STUPID_BACKOFF_ALPHA,
    bigram_lm_score,
    bigram_lm_train,
)

TRAIN = [
    (1, "a b a b c"),
    (2, "a b"),
]
# unigrams: a:3 b:3 c:1  → N=7, V=3
# bigrams: (a,b):3 (b,a):1 (b,c):1


@pytest.fixture(scope="module")
def model(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, text string")
    return bigram_lm_train(df)


def _score(spark, model, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bigram_lm_score(df, model)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_train_counts(model):
    uni = {r["w"]: r["c_uni"] for r in model["unigrams"].collect()}
    assert uni == {"a": 3, "b": 3, "c": 1}
    big = {(r["w1"], r["w2"]): r["c_big"] for r in model["bigrams"].collect()}
    assert big == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    tot = model["totals"].collect()[0]
    assert (tot["n_tokens"], tot["n_vocab"]) == (7, 3)


def test_seen_bigram_scores(spark, model):
    out = _score(spark, model, [(10, "b c")])
    r = out[10]
    # S(c|b) = 1/3 → −log2 = log2(3)
    assert r["n_bigrams"] == 1
    assert r["n_backoff"] == 0
    assert r["avg_neg_log2s"] == pytest.approx(math.log2(3), abs=1e-6)


def test_backoff_and_oov(spark, model):
    out = _score(spark, model, [(11, "a b z")])
    r = out[11]
    # (a,b): S = 3/3 = 1 → 0 bits; (b,z): OOV backoff
    # S = α·(0+1)/(7+3+1)
    s2 = STUPID_BACKOFF_ALPHA * 1 / 11
    expect = (0.0 + -math.log2(s2)) / 2
    assert r["n_bigrams"] == 2
    assert r["n_backoff"] == 1
    assert r["avg_neg_log2s"] == pytest.approx(round(expect, 6), abs=1e-6)


def test_backoff_seen_unigram(spark, model):
    # (c,a) unseen as a bigram but both words in-vocab:
    # S = α·(c(a)+1)/(N+V+1) = 0.4·4/11
    out = _score(spark, model, [(12, "c a")])
    r = out[12]
    s = STUPID_BACKOFF_ALPHA * (3 + 1) / 11
    assert r["n_backoff"] == 1
    assert r["avg_neg_log2s"] == pytest.approx(round(-math.log2(s), 6), abs=1e-6)


def test_short_and_null_docs(spark, model):
    out = _score(spark, model, [(13, "solo"), (14, ""), (15, None)])
    for did in (13, 14, 15):
        r = out[did]
        assert (r["n_bigrams"], r["n_backoff"], r["avg_neg_log2s"]) == (0, 0, 0.0)


def test_in_corpus_never_backs_off(spark, model):
    # every bigram of the training corpus is in the model by definition
    out = _score(spark, model, TRAIN)
    assert all(r["n_backoff"] == 0 for r in out.values())
    assert out[1]["n_bigrams"] == 4


def test_empty_training_corpus_stays_finite(spark):
    # sum over an empty vocab must coalesce to 0, not NULL-poison the
    # backoff denominator: S = α·1/(0+0+1) = α for every position
    empty = spark.createDataFrame(
        [(1, "   "), (2, None)], "doc_id long, text string"
    )
    model = bigram_lm_train(empty)
    tot = model["totals"].collect()[0]
    assert (tot["n_tokens"], tot["n_vocab"]) == (0, 0)
    out = _score(spark, model, [(20, "x y")])
    r = out[20]
    assert r["n_backoff"] == 1
    assert r["avg_neg_log2s"] == pytest.approx(
        round(-math.log2(STUPID_BACKOFF_ALPHA), 6), abs=1e-6
    )


def test_repartition_invariance(spark, model):
    rows = [(i, f"a b token{i} c a b") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r for r in bigram_lm_score(df, model).collect()}
    b = {
        r["doc_id"]: r
        for r in bigram_lm_score(df.repartition(7), model).collect()
    }
    assert a == b


def test_plan_jvm_side(spark, model):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bigram_lm_score(df, model).explain("simple")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Window" not in plan
    # the 1-row totals attach via broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan
