"""HTML rendering functions — the reference's output artifact, as columns.

The reference emits an interactive HTML document per input
(``src/html_generator.py:495-761``); the engine's table output is the
scalable analog, but the rendering pieces are kept as pure column
expressions for parity:

* HTML escaping (``html.escape`` equivalents used throughout the
  reference's renderer, e.g. ``src/html_generator.py:582``)
* deterministic sentence-span ids — the reference pairs original and
  mapped text via ``src-{id(item)}-{idx}`` / ``tgt-…`` DOM ids
  (``src/html_generator.py:583-637``); ``id(item)`` is a CPython object
  address, so the distributed replacement derives ids from
  ``(conv_id, turn_idx, pos)`` — stable across runs and executors
* the per-turn paragraph-row block (original + extracted side by side)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def html_escape(col: Column) -> Column:
    """Order matters: '&' first, then the rest (html.escape semantics,
    quote=True)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    out = F.replace(out, F.lit('"'), F.lit("&quot;"))
    out = F.replace(out, F.lit("'"), F.lit("&#x27;"))
    return out


def span_id(kind: str, conv_id: Column, turn_idx: Column, pos: Column) -> Column:
    """Deterministic DOM id: ``{kind}-{conv}-{turn}-{pos}`` (replaces the
    reference's id(item)-based ids, html_generator.py:583)."""
    return F.concat_ws(
        "-", F.lit(kind), conv_id, turn_idx.cast("string"), pos.cast("string")
    )


# Whole-document skeleton (compact original equivalent of the
# reference's interactive shell, src/html_generator.py:70-493): MathJax
# for formula blocks, CSS custom properties with a dark-theme override,
# sticky controls for theme + inspect mode, and the paragraph-row /
# page-marker / formula-block classes the row renderer emits. The JS
# mirrors the reference's behaviors — theme flip, inspect-mode class
# toggle, and src/tgt span pairing via data-src — in a deliberately
# small form (the reference's 400-line shell is its artifact, not its
# semantics).
DOC_HEADER = """<!DOCTYPE html>
<html lang="ko">
<head>
<meta charset="UTF-8">
<meta name="viewport" content="width=device-width, initial-scale=1.0">
<title>Docling Translation Result</title>
<script id="MathJax-script" async src="https://cdn.jsdelivr.net/npm/mathjax@3/es5/tex-mml-chtml.js"></script>
<style>
:root{--bg:#f4f6f8;--card:#fff;--fg:#222;--border:#eee;--hl:rgba(255,255,0,.3)}
[data-theme="dark"]{--bg:#1a1a1a;--card:#2d2d2d;--fg:#e0e0e0;--border:#404040}
body{font-family:'Segoe UI',sans-serif;background:var(--bg);color:var(--fg);margin:0;padding:20px}
.controls{display:flex;justify-content:flex-end;gap:10px;position:sticky;top:10px}
.paragraph-row{background:var(--card);border:1px solid var(--border);border-radius:8px;padding:12px;margin:8px 0}
.src-block{display:none}
body.inspect .src-block{display:block;color:#888}
.page-marker{text-align:center;color:#888;margin:16px 0;font-size:.9em}
.formula-block{background:var(--card);padding:12px;margin:8px 0;text-align:center}
.sent:hover,.sent.related{background:var(--hl)}
</style>
</head>
<body>
<div class="controls">
<button class="btn" onclick="document.documentElement.dataset.theme=document.documentElement.dataset.theme==='dark'?'':'dark'">Theme</button>
<button class="btn" onclick="document.body.classList.toggle('inspect')">Inspect</button>
</div>
<div class="content-container">
<script>
document.addEventListener('mouseover',function(e){
  var s=e.target.closest('.sent');if(!s)return;
  var src=s.dataset.src&&document.getElementById(s.dataset.src);
  if(src)src.classList.add('related');});
document.addEventListener('mouseout',function(e){
  var s=e.target.closest('.sent');if(!s)return;
  var src=s.dataset.src&&document.getElementById(s.dataset.src);
  if(src)src.classList.remove('related');});
</script>
"""

DOC_FOOTER = """</div> <!-- content-container -->
</body>
</html>
"""


def format_formula_col(text: Column) -> Column:
    """Column twin of :func:`docling_translate_spark.classify.format_formula`
    (ref html_generator.py:48-64): wrap bare LaTeX for MathJax block
    rendering unless already delimited."""
    t = F.trim(text)
    return (
        F.when(
            t.startswith("$") | t.startswith("\\[") | t.startswith("\\("), t
        )
        .when(
            t.contains("&"),
            F.concat(F.lit("\\[\\begin{aligned}"), t, F.lit("\\end{aligned}\\]")),
        )
        .otherwise(F.concat(F.lit("\\["), t, F.lit("\\]")))
    )


def document_html(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    orig_col: str = "text",
    extr_col: str = "extracted",
    page_col: str | None = None,
) -> DataFrame:
    """Assemble one complete interactive HTML document per conversation
    from per-turn rows — the whole-document twin of :func:`paragraph_row`
    (ref generate_html_content, src/html_generator.py:495-761).

    Per turn: a page marker when the page changes (lag over the
    conversation window, ref :538-545), a MathJax formula block for
    formula turns (ref :556-566), else a paragraph row. The document is
    the header + rows in (conv, turn) order + footer.

    Scale shape: the lag window and the assembly groupBy hash on the
    SAME key (conv), so Spark reuses the exchange — one shuffle total;
    ordering inside a conversation comes from ``array_sort`` over
    collected (idx, html) structs, never from physical row order. One
    document must fit in a task (same envelope as any per-document sink).
    """
    from docling_translate_spark.classify import FORMULA_REGEX

    # NULL text/extracted must render as an empty cell, not silently
    # drop the turn: F.concat null-propagates into _row_html and
    # collect_list skips NULLs, so without this coalesce a NULL turn
    # would vanish from the assembled document with no error (r2 ADVICE).
    df = df.withColumn(orig_col, F.coalesce(F.col(orig_col), F.lit(""))).withColumn(
        extr_col, F.coalesce(F.col(extr_col), F.lit(""))
    )

    row = F.when(
        F.regexp_like(F.col(orig_col), F.lit(FORMULA_REGEX)),
        F.concat(
            F.lit('<div class="formula-block">'),
            format_formula_col(F.col(orig_col)),
            F.lit("</div>"),
        ),
    ).otherwise(
        paragraph_row(
            F.col(conv_col), F.col(idx_col), F.col(orig_col), F.col(extr_col)
        )
    )
    if page_col is not None:
        w = Window.partitionBy(conv_col).orderBy(idx_col)
        prev = F.lag(page_col).over(w)
        marker = F.when(
            prev.isNull() | (F.col(page_col) != prev),
            F.concat(
                F.lit('<div class="page-marker">Page '),
                F.col(page_col).cast("string"),
                F.lit("</div>\n"),
            ),
        ).otherwise(F.lit(""))
        row = F.concat(marker, row)
    rows = df.withColumn("_row_html", row)
    body = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(idx_col).alias("i"), F.col("_row_html").alias("h"))
                )
            ),
            lambda s: s["h"],
        ),
        "\n",
    )
    return rows.groupBy(conv_col).agg(
        F.concat(F.lit(DOC_HEADER), body, F.lit("\n"), F.lit(DOC_FOOTER)).alias(
            "html"
        )
    )


def paragraph_row(
    conv_id: Column, turn_idx: Column, original: Column, extracted: Column
) -> Column:
    """One paragraph-row block: src span + tgt span with data-src pairing
    (shape per html_generator.py:621-637)."""
    sid = span_id("src", conv_id, turn_idx, F.lit(0))
    tid = span_id("tgt", conv_id, turn_idx, F.lit(0))
    esc_o, esc_e = html_escape(original), html_escape(extracted)
    return F.concat(
        F.lit('<div class="paragraph-row"><div class="src-block">'),
        F.lit('<span class="sent" id="'), sid, F.lit('">'), esc_o,
        F.lit('</span></div><div class="tgt-block">'),
        F.lit('<span class="sent" id="'), tid,
        F.lit('" data-src="'), sid, F.lit('">'), esc_e,
        F.lit("</span></div></div>"),
    )
