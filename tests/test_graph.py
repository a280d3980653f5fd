"""Integer PageRank (operators/graph.py) vs a pure-Python reference.

The operator promises bit-identical results at any partitioning, so the
reference replays the exact integer arithmetic (floor divisions, split
damping identity) and every test compares exact equality — no
tolerances anywhere.
"""

from collections import Counter, defaultdict

import pytest

from docling_translate_spark.operators.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    pagerank,
)

_BASE = ((PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE) // PR_DAMP_DEN


def ref_pagerank(edges, iters):
    """Exact replay of the operator's integer arithmetic in Python."""
    es = sorted({(s, d) for s, d in edges if s is not None and d is not None})
    verts = sorted({s for s, _ in es} | {d for _, d in es})
    outdeg = Counter(s for s, _ in es)
    n = len(verts)
    r = {v: PR_SCALE for v in verts}
    for _ in range(iters):
        contrib = {v: r[v] // outdeg[v] for v in outdeg}
        gathered = defaultdict(int)
        for s, d in es:
            gathered[d] += contrib[s]
        share = sum(r[v] for v in verts if v not in outdeg) // n
        r = {
            v: _BASE
            + PR_DAMP_NUM * ((gathered[v] + share) // PR_DAMP_DEN)
            + (PR_DAMP_NUM * ((gathered[v] + share) % PR_DAMP_DEN))
            // PR_DAMP_DEN
            for v in verts
        }
    return r


# hub (everyone links to h), a 2-cycle, a self-loop, a dangling target,
# a duplicate edge (must count once), and a NULL endpoint (dropped)
EDGES = [
    ("a", "h"),
    ("b", "h"),
    ("c", "h"),
    ("a", "b"),
    ("b", "a"),
    ("c", "c"),
    ("a", "sink"),
    ("a", "sink"),
    (None, "x"),
    ("y", None),
]


def _run(spark, edges, iters=4, parts=None):
    df = spark.createDataFrame(
        [e for e in edges], schema="src string, dst string"
    )
    if parts:
        df = df.repartition(parts)
    out = pagerank(df, iters=iters)
    return {r["vertex"]: r["rank_units"] for r in out.collect()}


def test_matches_python_reference(spark):
    got = _run(spark, EDGES, iters=4)
    want = ref_pagerank(EDGES, iters=4)
    assert got == want


def test_single_iteration(spark):
    assert _run(spark, EDGES, iters=1) == ref_pagerank(EDGES, iters=1)


def test_partitioning_invariance(spark):
    a = _run(spark, EDGES, iters=3, parts=1)
    b = _run(spark, EDGES, iters=3, parts=7)
    assert a == b


def test_hub_ranks_highest_and_mass_bounded(spark):
    got = _run(spark, EDGES, iters=4)
    assert max(got, key=got.get) == "h"
    n = len(got)
    assert sum(got.values()) <= n * PR_SCALE  # floors only shed mass
    assert all(v >= _BASE for v in got.values())  # teleport floor


def test_dangling_only_graph(spark):
    # every target is a sink: all mass funnels through the dangling
    # redistribution path
    edges = [("a", "s1"), ("b", "s2")]
    assert _run(spark, edges, iters=3) == ref_pagerank(edges, iters=3)


def test_invalid_iters_raises(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iters=0)


def test_plan_shape(spark):
    """No Window anywhere (the gather is agg-shaped on the hot dst) and
    the loop state is checkpoint-flattened (no join-per-round nesting
    in the final plan)."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    out = pagerank(df, iters=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # localCheckpoint per round: the final plan reads a scan, not a
    # 3-round join pyramid
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 0
    assert dict(out.dtypes)["rank_units"] == "bigint"


def test_anchor_text_rollup(spark):
    from docling_translate_spark.operators.graph import anchor_text_rollup

    edges = [
        # target h: "home" x3, "start" x2, "main" x1 -> top-2 cuts main
        ("s1", "h", "home"),
        ("s2", "h", "home"),
        ("s3", "h", "home"),
        ("s1", "h", "start"),
        ("s4", "h", "start"),
        ("s5", "h", "main"),
        # target p: 1-1 tie -> lexicographic anchors
        ("s1", "p", "beta"),
        ("s2", "p", "alpha"),
        # dropped rows
        ("s1", None, "ghost"),
        ("s2", "h", None),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, anchor string")
    got = {}
    for r in sorted(
        anchor_text_rollup(df, k=2, salt_buckets=4).collect(),
        key=lambda r: (r["dst"], r["rank"]),
    ):
        got.setdefault(r["dst"], []).append(
            (r["anchor"], r["n_refs"], r["rank"])
        )
    assert got == {
        "h": [("home", 3, 1), ("start", 2, 2)],
        "p": [("alpha", 1, 1), ("beta", 1, 2)],
    }
