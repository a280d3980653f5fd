"""Layout-block reading order: the docling-style step that turns a bag
of positioned page blocks into a reading-order DOM with character
spans (north star: "parses embedded PDF/layout blocks into a
reading-order DOM … table/figure span detection"; reference analog is
the linear `doc.iterate_items()` walk, /root/reference/src/core.py:401
— this operator generalizes it to 2-D positioned blocks).

Input: one row per block — ``(doc, page, x0, y0, x1, y1, kind, text)``
with bbox coordinates normalized to integer [0, 1000] page units
(integer arithmetic end-to-end keeps every decision SQL-oracle-able).

Per document the operator emits every block back with:

* ``role`` — 'furniture' for page furniture (running headers/footers:
  ``y0 >= furniture_y``), 'body' otherwise. Furniture is excluded from
  reading order and spans (docling's content-vs-furniture split).
* ``col`` + ``order_idx`` — simplified XY-cut: a page reads two-column
  iff every body block on it is narrower than ``min_col_width`` AND
  both x-halves (split at ``two_col_split``) are populated; then
  column-major (col, y0, x0), else row-major (y0, x0). ``order_idx``
  is the per-document reading position (page-major), NULL for
  furniture.
* ``char_start`` / ``char_end`` — offsets of the block's text in the
  reading-order document assembly, each block separated by 2 chars
  (the reference's ``len(para)+2`` paragraph-offset convention,
  src/text_parser.py).
* ``caption_of`` — for caption blocks: the block id of the nearest
  body table/figure ABOVE it on the same page (min vertical gap, then
  min |x0 distance|, then lowest block id), NULL if the page has none.

Scale shape: decisions are per-(doc, page) and per-doc — the two
window stages exchange on (doc, page) then (doc), both bounded keys (a
document holds a bounded number of blocks; there is no corpus-wide hot
key by construction, unlike a fingerprint window). Caption attachment
joins captions×anchors within one (doc, page) — bounded quadratic per
page, never global. No Python anywhere: pure column expressions +
window functions, all integer comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TWO_COL_SPLIT = 500
MIN_COL_WIDTH = 490
FURNITURE_Y = 950


def layout_reading_order(
    blocks: DataFrame,
    id_col: str = "doc_id",
    block_col: str = "block_id",
    page_col: str = "page",
    kind_col: str = "kind",
    text_col: str = "text",
    two_col_split: int = TWO_COL_SPLIT,
    min_col_width: int = MIN_COL_WIDTH,
    furniture_y: int = FURNITURE_Y,
) -> DataFrame:
    """Adds ``role, col, order_idx, char_start, char_end, caption_of``
    to a positioned-block table (see module docstring for semantics).

    ``block_col`` must be unique within a document — it is the
    deterministic tiebreak for overlapping blocks and the caption
    anchor identity.
    """
    body = F.col("role") == F.lit("body")
    b = blocks.withColumn(
        "role",
        F.when(F.col("y0") >= furniture_y, F.lit("furniture")).otherwise(
            F.lit("body")
        ),
    )

    # per-(doc, page) two-column decision over BODY blocks only:
    # window aggregates, not a groupBy+join — same exchange, no probe
    pg = Window.partitionBy(id_col, page_col)
    width_ok = F.max(
        F.when(body, F.col("x1") - F.col("x0"))
    ).over(pg) < F.lit(min_col_width)
    has_left = (
        F.sum(
            F.when(body & (F.col("x0") < two_col_split), 1).otherwise(0)
        ).over(pg)
        > 0
    )
    has_right = (
        F.sum(
            F.when(body & (F.col("x0") >= two_col_split), 1).otherwise(0)
        ).over(pg)
        > 0
    )
    b = b.withColumn("_two_col", width_ok & has_left & has_right)
    b = b.withColumn(
        "col",
        F.when(
            body & F.col("_two_col") & (F.col("x0") >= two_col_split), 1
        ).otherwise(0),
    )

    # reading order: page-major, then column-major/row-major inside the
    # page; furniture sorts after every body block (order_idx NULLed
    # below) so the body ranks are dense 1..n_body
    doc_w = Window.partitionBy(id_col).orderBy(
        body.cast("int").desc(),
        F.col(page_col),
        F.col("col"),
        F.col("y0"),
        F.col("x0"),
        F.col(block_col),
    )
    b = b.withColumn("_rn", F.row_number().over(doc_w))
    txt_len = F.length(F.coalesce(F.col(text_col), F.lit("")))
    # reference separator convention: each block contributes len+2
    b = (
        b.withColumn(
            "order_idx", F.when(body, F.col("_rn")).otherwise(F.lit(None))
        )
        .withColumn(
            "char_start",
            F.when(
                body,
                F.coalesce(
                    F.sum(F.when(body, txt_len + 2).otherwise(0)).over(
                        doc_w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            ).cast("long"),
        )
        .withColumn(
            "char_end",
            F.when(body, F.col("char_start") + txt_len).cast("long"),
        )
    )

    # caption attachment: nearest body table/figure strictly above on
    # the same page — bounded captions×anchors per (doc, page), global
    # arg-min via groupBy min(struct), never a corpus-wide key.
    # caps/anchors branch from the CHEAP pre-window projection (role is
    # one comparison), not from `b`: branching from b would re-execute
    # both window exchanges once per consumer (the fan-out trap); a
    # narrow re-scan is the cheaper recompute, same trade as
    # unigram_logprob's token explode.
    pre = blocks.withColumn(
        "role",
        F.when(F.col("y0") >= furniture_y, F.lit("furniture")).otherwise(
            F.lit("body")
        ),
    )
    caps = pre.filter(body & (F.col(kind_col) == "caption")).select(
        F.col(id_col).alias("_cd"),
        F.col(page_col).alias("_cp"),
        F.col(block_col).alias("_cb"),
        F.col("x0").alias("_cx"),
        F.col("y0").alias("_cy"),
    )
    anchors = pre.filter(
        body & F.col(kind_col).isin("table", "figure")
    ).select(
        F.col(id_col).alias("_ad"),
        F.col(page_col).alias("_ap"),
        F.col(block_col).alias("_ab"),
        F.col("x0").alias("_ax"),
        F.col("y1").alias("_ay1"),
    )
    pairs = caps.join(
        anchors,
        (F.col("_cd") == F.col("_ad"))
        & (F.col("_cp") == F.col("_ap"))
        & (F.col("_ay1") <= F.col("_cy")),
    )
    best = (
        pairs.groupBy("_cd", "_cb")
        .agg(
            F.min(
                F.struct(
                    (F.col("_cy") - F.col("_ay1")).alias("_gap"),
                    F.abs(F.col("_cx") - F.col("_ax")).alias("_dx"),
                    F.col("_ab").alias("_b"),
                )
            ).alias("_best")
        )
        .select("_cd", "_cb", F.col("_best._b").alias("caption_of"))
    )
    out = b.join(
        best,
        (F.col(id_col) == F.col("_cd")) & (F.col(block_col) == F.col("_cb")),
        "left",
    ).drop("_cd", "_cb", "_two_col", "_rn")
    return out
