"""NB quality classifier: from-spec reference parity (exact micro-unit
arithmetic), discrimination on held-out docs, empty/edge cases,
partition independence, and the broadcast/no-Python plan shape."""

import contextlib
import hashlib
import io
import math
import re

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.classifier import (
    NB_MICRO,
    nb_classify,
    nb_filter,
)

M = 64  # small bucket count so fixture collisions actually occur


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


# --- from-spec Python reference (mirrors the documented math, not the
# Spark code): whitespace grams, md5-prefix60 buckets, add-one NB ---


def _grams(text):
    toks = [t for t in re.split(r"\s+", (text or "").strip(" ").lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g, m=M):
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % m


def _ref_nb(score_docs, pos_docs, neg_docs, m=M):
    pc, nc = {}, {}
    for t in pos_docs.values():
        for g in _grams(t):
            b = _bucket(g, m)
            pc[b] = pc.get(b, 0) + 1
    for t in neg_docs.values():
        for g in _grams(t):
            b = _bucket(g, m)
            nc[b] = nc.get(b, 0) + 1
    P, N = sum(pc.values()), sum(nc.values())
    w = {
        b: round(
            (
                math.log((pc.get(b, 0) + 1) / (P + m))
                - math.log((nc.get(b, 0) + 1) / (N + m))
            )
            * NB_MICRO
        )
        for b in range(m)
    }
    prior = round(
        (math.log(len(pos_docs) + 1) - math.log(len(neg_docs) + 1)) * NB_MICRO
    )
    out = {}
    for i, t in score_docs.items():
        gs = _grams(t)
        s = prior + sum(w[_bucket(g, m)] for g in gs)
        out[i] = (len(gs), s / NB_MICRO, "pos" if s > 0 else "neg")
    return out


POS = {
    100: "thorough peer reviewed analysis of careful experimental method",
    101: "rigorous analysis with careful reviewed method and evidence",
    102: "peer reviewed evidence and thorough careful experimental analysis",
}
NEG = {
    200: "click here buy cheap now win free prize click buy",
    201: "cheap prize win now click free buy here now",
    202: "free cheap click prize buy win here now free",
}
SCORE = {
    1: "careful peer reviewed experimental analysis",  # pos-flavored
    2: "buy cheap prize click now",  # neg-flavored
    3: "",  # empty: prior only
    4: "completely unrelated novel vocabulary zzqx",  # unseen grams
}


@pytest.fixture(scope="module")
def frames(spark):
    mk = lambda d: spark.createDataFrame(  # noqa: E731
        list(d.items()), "doc_id long, text string"
    )
    return mk(SCORE), mk(POS), mk(NEG)


def test_reference_parity_exact(spark, frames):
    df, pos, neg = frames
    got = {
        r["doc_id"]: (r["n_grams"], r["nb_score"], r["nb_label"])
        for r in nb_classify(df, pos, neg, m_buckets=M).collect()
    }
    want = _ref_nb(SCORE, POS, NEG)
    assert got == want  # exact: same integers, same single division


def test_discrimination_and_labels(spark, frames):
    df, pos, neg = frames
    got = {
        r["doc_id"]: r for r in nb_classify(df, pos, neg, m_buckets=M).collect()
    }
    assert got[1]["nb_score"] > got[2]["nb_score"]
    assert got[1]["nb_label"] == "pos" and got[2]["nb_label"] == "neg"


def test_empty_doc_scores_prior_only(spark, frames):
    df, pos, neg = frames
    row = {
        r["doc_id"]: r for r in nb_classify(df, pos, neg, m_buckets=M).collect()
    }[3]
    # equal seed doc counts -> prior is exactly 0
    assert row["n_grams"] == 0 and row["nb_score"] == 0.0
    assert row["nb_label"] == "neg"  # ties at 0 go negative


def test_partition_independent(spark, frames):
    df, pos, neg = frames
    a = sorted(map(tuple, nb_classify(df, pos, neg, m_buckets=M).collect()))
    b = sorted(
        map(
            tuple,
            nb_classify(
                df.repartition(7), pos.repartition(5), neg, m_buckets=M
            ).collect(),
        )
    )
    assert a == b


def test_nb_filter_keeps_positive_rows_with_columns(spark, frames):
    df, pos, neg = frames
    labels = {
        r["doc_id"]: r["nb_label"]
        for r in nb_classify(df, pos, neg, m_buckets=M).collect()
    }
    kept = nb_filter(df, pos, neg, m_buckets=M).collect()
    assert {r["doc_id"] for r in kept} == {
        i for i, l in labels.items() if l == "pos"
    }
    assert set(kept[0].asDict()) == {"doc_id", "text"}  # passthrough


def test_plan_broadcast_weights_no_python_no_window(spark, frames):
    df, pos, neg = frames
    plan = _plan(nb_classify(df, pos, neg, m_buckets=M))
    assert "BroadcastHashJoin" in plan
    # the scoring join on the bucket key must never regress to a
    # shuffle join (m distinct keys over a corpus-sized gram table =
    # guaranteed hot partitions); the final id-reattach join may be SMJ
    for block in re.split(r"\n\(\d+\) ", plan):
        head = block.split("\n", 1)[0]
        if "SortMergeJoin" in head or "ShuffledHashJoin" in head:
            assert "_b" not in block, block
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan
