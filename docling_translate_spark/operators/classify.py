"""Classification operator over segment rows — pure column expressions.

Reclassifies spans the segmenters marked translatable:

* LaTeX-looking spans → ``formula`` (exempt from the content map,
  reference ``src/html_generator.py:20-45`` and the bypass at ``:551-559``)
* page-chrome spans (every non-blank line matches the boilerplate line
  battery) → ``boilerplate`` (the PAGE_HEADER/PAGE_FOOTER skip,
  reference ``src/html_generator.py:617-619``)

Everything stays JVM-side (regexp_like / forall / filter on a split
array) so the whole stage lives inside WholeStageCodegen — no Python
crossing for classification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from docling_translate_spark.classify import BOILERPLATE_LINE_REGEX, FORMULA_REGEX


def classify_segments(segments: DataFrame) -> DataFrame:
    """Add final ``segment_type``/``translatable`` after formula and
    boilerplate detection, plus an ``is_content`` flag.

    Caption/table-cell/header spans are exempt: the reference pools them
    into the sentence set unconditionally (src/core.py:429-448), with no
    formula/boilerplate pass."""
    from docling_translate_spark.operators.segment import AUX_SEGMENT_TYPES

    txt = F.col("text")
    not_aux = ~F.col("segment_type").isin(*AUX_SEGMENT_TYPES)
    is_formula = (
        F.col("translatable") & not_aux & F.regexp_like(txt, F.lit(FORMULA_REGEX))
    )

    nonblank_lines = F.filter(
        F.split(txt, "\n"), lambda ln: F.trim(ln) != F.lit("")
    )
    is_boiler = (
        F.col("translatable")
        & not_aux
        & ~is_formula
        & (F.size(nonblank_lines) > 0)
        & F.forall(
            nonblank_lines, lambda ln: F.regexp_like(ln, F.lit(BOILERPLATE_LINE_REGEX))
        )
    )

    seg_type = (
        F.when(is_formula, F.lit("formula"))
        .when(is_boiler, F.lit("boilerplate"))
        .otherwise(F.col("segment_type"))
    )
    translatable = F.col("translatable") & ~is_formula & ~is_boiler

    return (
        segments.withColumn("segment_type", seg_type)
        .withColumn("translatable", translatable)
        .withColumn(
            "is_content",
            translatable & (F.trim(txt) != F.lit("")),
        )
    )
