"""HTML main-content extraction: tag-ratio / link-density / text-density
block classification (jusText/Boilerpipe-style heuristics)."""

from docling_translate_spark.operators.html_boiler import extract_main_content


PAGE = (
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/x">X</a></li>'
    "</ul></nav>"
    "<h1>Short Title</h1>"
    "<p>This paragraph is long enough to count as genuine running text "
    "for the classifier.</p>"
    '<p>Inline <b>markup &amp; entities</b> with <a href="/l">one link</a> '
    "inside a long enough paragraph of prose.</p>"
    '<div>Links: <a href="/a">aaa</a> <a href="/b">bbb</a> '
    '<a href="/c">ccc</a></div>'
    "<footer>© 2026 Example Corp — All rights reserved</footer>"
)


def test_block_classification(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, text string")
    (row,) = extract_main_content(df).collect()
    lines = row["main_text"].split("\n")
    assert lines == [
        "This paragraph is long enough to count as genuine running text "
        "for the classifier.",
        "Inline markup & entities with one link inside a long enough "
        "paragraph of prose.",
    ]
    # nav link farm: each link is its own too-short block
    assert row["n_content_blocks"] == 2
    assert row["boilerplate_ratio"] > 0.5


def test_plain_text_passes_through(spark):
    """A markup-free turn is one block of running text — the operator is
    safe over mixed HTML/plain corpora."""
    txt = "plain prose with more than five words and no markup at all"
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    (row,) = extract_main_content(df).collect()
    assert row["main_text"] == txt
    assert (row["n_blocks"], row["n_content_blocks"]) == (1, 1)
    assert row["boilerplate_ratio"] == 0.0


def test_link_farm_and_copyright_dropped(spark):
    """Long but link-dense blocks AND line-battery matches (© footers)
    are boilerplate even when they clear the word-count bar."""
    page = (
        '<div><a href="/1">first link text</a> <a href="/2">second link '
        'text</a> <a href="/3">third link text here</a></div>'
        "<footer>© 2026 Example Corp — All rights reserved</footer>"
        "<p>actual content paragraph with enough words to be kept</p>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    (row,) = extract_main_content(df).collect()
    assert row["main_text"] == (
        "actual content paragraph with enough words to be kept"
    )


def test_empty_and_null(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["main_text"], r["n_blocks"], r["boilerplate_ratio"])
           for r in extract_main_content(df).collect()}
    assert got == {1: ("", 0, 0.0), 2: ("", 0, 0.0)}


def test_zero_shuffle_jvm_plan(spark):
    """The whole operator is one codegen projection: no exchange, no
    Python."""
    import contextlib
    import io

    df = spark.createDataFrame([(1, PAGE)], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        extract_main_content(df).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_tag_soup_fuzz_invariants(spark):
    """Seeded tag-soup battery: on arbitrary (including malformed) HTML
    the classifier must never crash, counts must be consistent, and
    main_text must be exactly the concatenation of content blocks."""
    import random

    rng = random.Random(7)
    frags = [
        "<p>", "</p>", "<div>", "</div>", "<li>", "<br>", "<a href='/x'>",
        "</a>", "<b>", "</b>", "<", ">", "&amp;", "&nbsp;", "word",
        "longer text run with several words here", " ", "\n", "©",
        "Page 3 of 12", "---", "<h1>", "</h1>", "<table>", "<td>",
        "<a", "href=>", "<>", "</>",
    ]
    rows = [
        (i, "".join(rng.choice(frags) for _ in range(rng.randint(0, 40))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = extract_main_content(df).collect()
    assert len(got) == 120
    for r in got:
        assert 0 <= r["n_content_blocks"] <= r["n_blocks"]
        assert 0.0 <= r["boilerplate_ratio"] <= 1.0
        assert (r["main_text"] != "") == (r["n_content_blocks"] > 0)
        if r["main_text"]:
            # every emitted line is a non-empty, whitespace-normalized block
            for line in r["main_text"].split("\n"):
                assert line == line.strip() and "  " not in line
    # deterministic
    again = extract_main_content(df).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_non_anchor_a_tags_do_not_count_as_links(spark):
    """<abbr>/<address>/<audio> must not anchor link-text extraction —
    the r3 review found '<a[^>]*>' swallowed whole content blocks."""
    page = (
        '<p><abbr title="HyperText Markup Language">HTML</abbr> is a web '
        'standard used everywhere, see <a href="/d">docs</a> for all the '
        "details about it</p>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    (row,) = extract_main_content(df).collect()
    assert row["n_content_blocks"] == 1
    assert "web standard" in row["main_text"]
