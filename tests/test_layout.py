"""Layout reading order: from-spec reference parity on adversarial
fixtures (two-column detection, furniture, caption attachment, ties),
determinism under repartition, and plan shape."""

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.layout import layout_reading_order

SCHEMA = (
    "doc_id long, block_id long, page long, x0 long, y0 long, "
    "x1 long, y1 long, kind string, text string"
)


def _ref_layout(rows):
    """From-spec mirror of layout_reading_order's semantics."""
    out = []
    docs = sorted({r[0] for r in rows})
    for d in docs:
        blks = [
            {
                "doc_id": r[0],
                "block_id": r[1],
                "page": r[2],
                "x0": r[3],
                "y0": r[4],
                "x1": r[5],
                "y1": r[6],
                "kind": r[7],
                "text": r[8] or "",
            }
            for r in rows
            if r[0] == d
        ]
        for b in blks:
            b["role"] = "furniture" if b["y0"] >= 950 else "body"
        pages = {b["page"] for b in blks}
        two_col = {}
        for p in pages:
            body = [b for b in blks if b["page"] == p and b["role"] == "body"]
            two_col[p] = bool(
                body
                and max(b["x1"] - b["x0"] for b in body) < 490
                and any(b["x0"] < 500 for b in body)
                and any(b["x0"] >= 500 for b in body)
            )
        for b in blks:
            b["col"] = (
                1
                if b["role"] == "body"
                and two_col[b["page"]]
                and b["x0"] >= 500
                else 0
            )
        body = sorted(
            (b for b in blks if b["role"] == "body"),
            key=lambda b: (b["page"], b["col"], b["y0"], b["x0"], b["block_id"]),
        )
        cum = 0
        for i, b in enumerate(body):
            b["order_idx"] = i + 1
            b["char_start"] = cum
            b["char_end"] = cum + len(b["text"])
            cum += len(b["text"]) + 2
        for b in blks:
            b.setdefault("order_idx", None)
            b.setdefault("char_start", None)
            b.setdefault("char_end", None)
            b["caption_of"] = None
            if b["role"] == "body" and b["kind"] == "caption":
                anchors = [
                    a
                    for a in blks
                    if a["page"] == b["page"]
                    and a["role"] == "body"
                    and a["kind"] in ("table", "figure")
                    and a["y1"] <= b["y0"]
                ]
                if anchors:
                    b["caption_of"] = min(
                        anchors,
                        key=lambda a: (
                            b["y0"] - a["y1"],
                            abs(b["x0"] - a["x0"]),
                            a["block_id"],
                        ),
                    )["block_id"]
        out.extend(blks)
    key = lambda b: (b["doc_id"], b["block_id"])
    return sorted(
        (
            (
                b["doc_id"],
                b["block_id"],
                b["role"],
                b["col"],
                b["order_idx"],
                b["char_start"],
                b["char_end"],
                b["caption_of"],
            )
            for b in out
        ),
        key=lambda t: (t[0], t[1]),
    )


# doc 1: a two-column page (0) + a single-column page (1, wide block)
# doc 2: furniture, captions with and without anchors, ties
ROWS = [
    # doc 1 page 0: two columns (narrow blocks, both halves)
    (1, 0, 0, 100, 200, 300, 240, "text", "left top"),
    (1, 1, 0, 600, 100, 800, 140, "text", "right top"),
    (1, 2, 0, 100, 500, 300, 540, "figure", "left fig"),
    (1, 3, 0, 600, 400, 800, 440, "caption", "right cap"),
    # doc 1 page 1: one 600-wide block forces single-column
    (1, 4, 1, 100, 100, 700, 140, "text", "wide"),
    (1, 5, 1, 600, 300, 700, 340, "text", "narrow right"),
    # doc 2 page 0: furniture footer + caption below figure + tie on y0
    (2, 0, 0, 100, 960, 300, 990, "text", "footer"),
    (2, 1, 0, 100, 100, 300, 200, "figure", "fig A"),
    (2, 2, 0, 120, 100, 320, 200, "table", "tbl B"),
    (2, 3, 0, 110, 300, 310, 330, "caption", "caption C"),
    (2, 4, 0, 100, 50, 300, 80, "caption", "cap no anchor above"),
    (2, 5, 0, 100, 300, 300, 330, "text", ""),
]


def _collect(spark, rows, parts=None):
    df = spark.createDataFrame(rows, SCHEMA)
    if parts:
        df = df.repartition(parts)
    got = layout_reading_order(df).collect()
    return sorted(
        (
            (
                r.doc_id,
                r.block_id,
                r.role,
                r.col,
                r.order_idx,
                r.char_start,
                r.char_end,
                r.caption_of,
            )
            for r in got
        ),
        key=lambda t: (t[0], t[1]),
    )


def test_layout_matches_reference(spark):
    assert _collect(spark, ROWS) == _ref_layout(ROWS)


def test_layout_two_column_ordering(spark):
    got = {(r[0], r[1]): r for r in _collect(spark, ROWS)}
    # doc 1 page 0 is two-column: left column (0, 2) reads before
    # right column (1, 3) despite y interleaving
    order = [got[(1, i)][4] for i in (0, 2, 1, 3)]
    assert order == sorted(order)
    assert got[(1, 1)][3] == 1 and got[(1, 3)][3] == 1  # right col
    # page 1 has a 600-wide block: single column, y-major
    assert got[(1, 4)][4] < got[(1, 5)][4]
    assert got[(1, 5)][3] == 0


def test_layout_furniture_and_spans(spark):
    got = {(r[0], r[1]): r for r in _collect(spark, ROWS)}
    assert got[(2, 0)][2] == "furniture"
    assert got[(2, 0)][4] is None and got[(2, 0)][5] is None
    # spans: consecutive body blocks are len+2 apart
    body = sorted(
        (r for r in _collect(spark, ROWS) if r[0] == 2 and r[4] is not None),
        key=lambda r: r[4],
    )
    for prev, cur in zip(body, body[1:]):
        assert cur[5] == prev[6] + 2


def test_layout_caption_attachment(spark):
    got = {(r[0], r[1]): r for r in _collect(spark, ROWS)}
    # caption C (y0=300) attaches to the nearest anchor above by
    # (gap, |dx|, id): fig A and tbl B both end at y1=200 (gap=100);
    # |dx| = 10 vs 10 → tie → lowest block_id (1, fig A)
    assert got[(2, 3)][7] == 1
    # caption with no anchor above stays unattached
    assert got[(2, 4)][7] is None
    # non-captions never get caption_of
    assert got[(1, 0)][7] is None
    # doc 1's caption (y0=400) attaches to nothing above on its page?
    # fig block 2 has y1=540 > 400 → not above → NULL
    assert got[(1, 3)][7] is None


def test_layout_deterministic_under_repartition(spark):
    assert _collect(spark, ROWS, parts=7) == _collect(spark, ROWS)


def test_layout_plan_jvm_side(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        layout_reading_order(df).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan  # the bounded per-doc rank
