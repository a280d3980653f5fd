"""End-to-end per-turn main-content extraction pipeline.

Mirrors the reference's query lifecycle (reference ``src/core.py:324-536``)
re-planned for Spark:

1. segment turns into spans            (mapInPandas, narrow)
2. classify formula / boilerplate      (column exprs, codegen)
3. dedup unique content texts          (``distinct`` — the reference's
                                        ``list(set(all_sentences))``,
                                        ``src/core.py:453-455``)
4. apply the deterministic map engine  (Arrow-batched pandas UDF — the
                                        "translate" stage,
                                        ``src/translation/base.py:38-97``)
5. broadcast equi-join results back by exact text with identity fallback
   (``src/core.py:486``, ``src/html_generator.py:565-567``, ``:692``)
6. reassemble per turn in span order   (groupBy + array_sort, no window)
7. restore every input turn (empty turns emit '' + zero spans) and the
   stable ``(conv_id, turn_idx)`` ordering

Scale notes (100 TB / 10^12 turns):

* Steps 1-2 are shuffle-free; parallelism = scan partitions. Callers on
  skewed sources should ``repartitionByRange(conv_id, turn_idx)`` first —
  range on the *pair* splits a million-turn conversation across tasks, so
  no salting is needed for the map side (``plans/session.py`` enables AQE
  + skew-join for the shuffles below).
* Step 3 is the one unavoidable shuffle; partial (map-side) aggregation
  makes it cheap because duplicate texts collapse before the exchange.
* Step 5 broadcasts the deduped map when it fits (configurable); at sizes
  beyond broadcast the same code degrades to a shuffle hash join that AQE
  plans, with skew-join splitting hot texts.
* Step 6 groups on ``(conv_id, turn_idx)`` — fine-grained keys, so a hot
  conversation is NOT a hot key here.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from docling_translate_spark.extract_map import create_engine
from docling_translate_spark.operators.classify import classify_segments
from docling_translate_spark.operators.segment import segment_turns

# Separator used when stitching per-turn content spans back together.
CONTENT_JOINER = "\n\n"


@dataclass(frozen=True)
class ExtractConfig:
    engine: str = "identity"
    dedup: bool = True          # dedupe unique texts before the map stage
    broadcast_map: bool = True  # broadcast the deduped map for the join-back
    ordered: bool = False       # global (conv_id, turn_idx) sort of output


def mapped_unique_texts(content: DataFrame, engine: str) -> DataFrame:
    """Steps 3-4: distinct content texts + the batched map engine."""
    fn = create_engine(engine)

    @F.pandas_udf(StringType())
    def _apply(texts: pd.Series) -> pd.Series:
        return fn(texts).astype("string")

    return content.select("text").distinct().withColumn("mapped", _apply("text"))


def extract_turns(transcripts: DataFrame, config: ExtractConfig | None = None) -> DataFrame:
    """Run the full extraction pipeline; returns EXTRACTED_SCHEMA rows."""
    cfg = config or ExtractConfig()

    segments = classify_segments(segment_turns(transcripts))

    if cfg.dedup:
        unique = mapped_unique_texts(segments.filter("is_content"), cfg.engine)
        map_side = F.broadcast(unique) if cfg.broadcast_map else unique
        joined = segments.join(map_side, on="text", how="left")
    else:
        fn = create_engine(cfg.engine)

        @F.pandas_udf(StringType())
        def _apply(texts: pd.Series) -> pd.Series:
            return fn(texts).astype("string")

        joined = segments.withColumn(
            "mapped", F.when(F.col("is_content"), _apply("text"))
        )

    # Content spans contribute coalesce(mapped, text) — the reference's
    # identity fallback (html_generator.py:692); others contribute null.
    content_out = F.when(
        F.col("is_content"), F.coalesce(F.col("mapped"), F.col("text"))
    )

    per_turn = (
        joined.groupBy("conv_id", "turn_idx")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("span_idx"),
                        F.col("start_pos"),
                        F.col("end_pos"),
                        F.col("segment_type"),
                        F.col("translatable"),
                        F.col("line_number"),
                        content_out.alias("content_text"),
                    )
                )
            ).alias("sorted_spans")
        )
        .select(
            "conv_id",
            "turn_idx",
            F.array_join(
                F.filter(
                    F.transform(F.col("sorted_spans"), lambda s: s["content_text"]),
                    lambda t: t.isNotNull(),
                ),
                CONTENT_JOINER,
            ).alias("extracted_text"),
            F.transform(
                F.col("sorted_spans"),
                lambda s: F.struct(
                    s["start_pos"].alias("start_pos"),
                    s["end_pos"].alias("end_pos"),
                    s["segment_type"].alias("segment_type"),
                    s["translatable"].alias("translatable"),
                    s["line_number"].alias("line_number"),
                ),
            ).alias("spans"),
            F.size("sorted_spans").alias("n_spans"),
            (
                F.size(
                    F.filter(
                        F.col("sorted_spans"),
                        lambda s: s["segment_type"] == F.lit("boilerplate"),
                    )
                ).cast("double")
                / F.size("sorted_spans").cast("double")
            ).alias("boilerplate_ratio"),
        )
    )

    # Restore turns that produced zero spans (empty / binary payloads):
    # per-turn parity with the input is part of the output contract.
    turn_keys = transcripts.select("conv_id", "turn_idx")
    out = (
        turn_keys.join(per_turn, on=["conv_id", "turn_idx"], how="left")
        .withColumn("extracted_text", F.coalesce("extracted_text", F.lit("")))
        .withColumn(
            "spans",
            F.coalesce("spans", F.expr(
                "CAST(array() AS array<struct<start_pos:int,end_pos:int,"
                "segment_type:string,translatable:boolean,line_number:int>>)"
            )),
        )
        .withColumn("n_spans", F.coalesce("n_spans", F.lit(0)))
        .withColumn("boilerplate_ratio", F.coalesce("boilerplate_ratio", F.lit(0.0)))
    )

    if cfg.ordered:
        out = out.repartitionByRange("conv_id", "turn_idx").sortWithinPartitions(
            "conv_id", "turn_idx"
        )
    return out
