"""Whole-document HTML assembly: pinned golden byte-equality, ordering
invariance under physical repartitioning, and the one-shuffle plan shape
(the lag window and the assembly groupBy share the conv hash)."""

import contextlib
import io
import pathlib

from docling_translate_spark.functions.render import document_html

DATA = pathlib.Path(__file__).parent / "data"

ROWS = [
    ("conv-A", 0, "Title & <intro>", "TITLE & <INTRO>", 1),
    ("conv-A", 1, "x^{2} &= \\frac{a}{b}", "ignored-for-formula", 1),
    ("conv-A", 2, "Second page starts 'here'.", "SECOND PAGE.", 2),
    ("conv-A", 3, "Same page follow-up.", "FOLLOW-UP.", 2),
    ("conv-B", 7, "Other conversation.", "OTHER.", 1),
]
SCHEMA = "conv_id string, turn_idx int, text string, extracted string, page int"


def _collect(spark, df):
    return {r["conv_id"]: r["html"] for r in document_html(df, page_col="page").collect()}


def test_document_golden_bytes(spark):
    out = _collect(spark, spark.createDataFrame(ROWS, SCHEMA))
    assert out["conv-A"] == (DATA / "document_golden_a.html").read_text()
    assert out["conv-B"] == (DATA / "document_golden_b.html").read_text()


def test_document_order_is_logical_not_physical(spark):
    """Rows arriving in any partition layout / order must assemble the
    same document (array_sort on turn_idx, not physical order)."""
    shuffled = list(reversed(ROWS))
    df = spark.createDataFrame(shuffled, SCHEMA).repartition(7)
    out = _collect(spark, df)
    assert out["conv-A"] == (DATA / "document_golden_a.html").read_text()


def test_document_single_shuffle(spark):
    """Page-marker lag window and assembly groupBy both hash on conv_id:
    exactly one exchange in the plan."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan_df = document_html(df, page_col="page")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("simple")
    plan = buf.getvalue()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_document_structure(spark):
    html = _collect(spark, spark.createDataFrame(ROWS, SCHEMA))["conv-A"]
    assert html.startswith("<!DOCTYPE html>")
    assert html.rstrip().endswith("</html>")
    # page markers only at transitions: pages 1 and 2 once each
    assert html.count('<div class="page-marker">') == 2
    # formula turn renders as a MathJax block, not a paragraph row
    assert "\\[\\begin{aligned}x^{2} &= \\frac{a}{b}\\end{aligned}\\]" in html
    # escaping applied to both src and tgt spans
    assert "Title &amp; &lt;intro&gt;" in html
    assert "&#x27;here&#x27;" in html
    # span pairing ids are deterministic
    assert 'id="src-conv-A-0-0"' in html
    assert 'data-src="src-conv-A-0-0"' in html


def test_document_null_turn_renders_empty_not_dropped(spark):
    """A NULL text/extracted turn must appear as an empty cell, not
    vanish from the assembled document (r2 ADVICE: F.concat
    null-propagates and collect_list skips NULLs)."""
    df = spark.createDataFrame(
        [("c1", 0, "hello", "hello"), ("c1", 1, None, None), ("c1", 2, "bye", "bye")],
        "conv_id string, turn_idx int, text string, extracted string",
    )
    html = document_html(df).collect()[0]["html"]
    assert html.count('class="paragraph-row"') == 3
    assert html.index("hello") < html.index("bye")
