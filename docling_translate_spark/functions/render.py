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

from pyspark.sql import Column, functions as F


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
