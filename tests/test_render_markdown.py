"""Markdown render stage: subset-renderer fixtures (fenced_code, tables,
nl2br — the reference's three extensions) + Spark column parity."""

from docling_translate_spark.functions.markdown_render import (
    render_markdown,
    render_markdown_col,
)


def test_fenced_code_block():
    out = render_markdown("before\n\n```python\nx = 1 < 2\n```\n\nafter")
    assert '<pre><code class="language-python">x = 1 &lt; 2\n</code></pre>' in out
    assert "<p>before</p>" in out and "<p>after</p>" in out


def test_unclosed_fence_runs_to_end():
    out = render_markdown("```\ncode line")
    assert "<pre><code>code line\n</code></pre>" in out


def test_pipe_table():
    out = render_markdown("| a | b |\n|---|---|\n| 1 | 2 |")
    assert "<table>" in out and "<th>a</th>" in out and "<td>2</td>" in out


def test_nl2br_inside_paragraph():
    out = render_markdown("line one\nline two")
    assert out == "<p>line one<br />\nline two</p>"


def test_headers_and_inline():
    out = render_markdown("## Title\n\nsome `code` and **bold** and *em*")
    assert "<h2>Title</h2>" in out
    assert "<code>code</code>" in out
    assert "<strong>bold</strong>" in out and "<em>em</em>" in out


def test_html_escaped():
    out = render_markdown("a < b & c")
    assert "&lt;" in out and "&amp;" in out and "<script" not in out


def test_empty_and_none():
    assert render_markdown("") == ""
    assert render_markdown(None) == ""


def test_column_matches_pure(spark):
    texts = [
        "# H\n\npara\nline2",
        "```sh\nls | wc\n```",
        "| x |\n|---|\n| 1 |",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    )
    rows = {
        r["i"]: r["h"]
        for r in df.select("i", render_markdown_col("t").alias("h")).collect()
    }
    for i, t in enumerate(texts):
        expected = render_markdown(t) if t is not None else None
        assert rows[i] == expected, i
