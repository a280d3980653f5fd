"""Per-document TF-IDF keywords: hand-computed fixtures (tf weighting,
idf damping of ubiquitous terms, lexicographic tie-break, k cut,
token-free docs), repartition invariance, and the plan disciplines
(bounded per-doc window, JVM-side, 1-row broadcast total).
"""

import contextlib
import io
import math

import pytest

from docling_translate_spark.operators.retrieval import tfidf_keywords

DOCS = [
    (1, "apple apple banana common"),
    (2, "banana cherry common"),
    (3, "common common date"),
]
N = 3


def _idf_micro(df_count):
    return round(math.log((N + 1) / (df_count + 1)) * 1_000_000)


@pytest.fixture(scope="module")
def ranked(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = tfidf_keywords(df, k=2)
    res = {}
    for r in out.collect():
        res.setdefault(r["doc_id"], []).append(r)
    for v in res.values():
        v.sort(key=lambda r: r["rank"])
    return res


def test_scores_and_ranking(ranked):
    # doc 1: apple tf=2 df=1 → 2·idf(1); banana tf=1 df=2; common df=3
    r = ranked[1]
    assert [x["term"] for x in r] == ["apple", "banana"]
    assert r[0]["tf"] == 2
    assert r[0]["score_micro"] == 2 * _idf_micro(1)
    assert r[1]["score_micro"] == 1 * _idf_micro(2)


def test_ubiquitous_term_damped(ranked):
    # 'common' (df=N) has idf ln(4/4)=0 → score 0: never a keyword
    # unless nothing else exists
    for did in (1, 2):
        assert all(x["term"] != "common" for x in ranked[did])
    # doc 3 has only 'date' above it
    assert [x["term"] for x in ranked[3]] == ["date", "common"]
    assert ranked[3][1]["score_micro"] == 0


def test_tie_break_lexicographic(ranked):
    # doc 2: banana and cherry both tf=1; cherry df=1 beats banana df=2
    assert [x["term"] for x in ranked[2]] == ["cherry", "banana"]


def test_k_cut_and_rank_values(ranked):
    for did, rows in ranked.items():
        assert len(rows) <= 2
        assert [x["rank"] for x in rows] == list(range(1, len(rows) + 1))


def test_tokenfree_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "word here"), (2, "   "), (3, None)], "doc_id long, text string"
    )
    out = tfidf_keywords(df, k=3)
    assert sorted(set(r["doc_id"] for r in out.collect())) == [1]


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        tfidf_keywords(df, k=0)


def test_repartition_invariance(spark):
    rows = [(i, f"alpha beta{i % 5} gamma{i % 3} alpha") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, tfidf_keywords(df, k=2).collect()))
    b = sorted(map(tuple, tfidf_keywords(df.repartition(7), k=2).collect()))
    assert a == b


def test_plan_disciplines(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        tfidf_keywords(df, k=2).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the N total attaches as a 1-row broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan
    # every Window-family node (incl. the WindowGroupLimit rank
    # pushdown) partitions on the doc id — bounded by one doc
    win_blocks = [
        b for b in plan.split("\n\n") if "Window" in b.split("\n")[0]
    ]
    assert win_blocks, plan
    for blk in win_blocks:
        assert "_did" in blk, blk
