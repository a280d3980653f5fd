"""Aggregation / metrics rollups (SURVEY §2.5) — the benchmark-record
analog of the reference's ``TimeRecord``/``StatRecord``
(``src/benchmark.py:18-31``, ``:73-85``) plus per-conversation rollups.

Per-conversation aggregation is the one place long-transcript key skew
bites (a single conversation with 10^6 turns lands on one reducer), so
the rollup is two-phase salted: partial aggregate on (conv_id, salt),
final aggregate on conv_id — the partials are tiny, the hot key fans out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def conversation_rollup(extracted: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Per-conversation extraction metrics (A6), skew-safe.

    Phase 1 groups on (conv_id, salt) — a hot conversation spreads over
    ``salt_buckets`` reducers; phase 2 merges the small partials.
    """
    salted = extracted.withColumn(
        "salt", F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets))
    )
    partial = salted.groupBy("conv_id", "salt").agg(
        F.count("*").alias("p_turns"),
        F.sum("n_spans").alias("p_spans"),
        F.sum(F.col("boilerplate_ratio") * F.col("n_spans")).alias("p_weighted_boiler"),
        F.sum((F.length("extracted_text") > 0).cast("long")).alias("p_nonempty"),
    )
    return partial.groupBy("conv_id").agg(
        F.sum("p_turns").alias("n_turns"),
        F.sum("p_spans").cast("long").alias("n_spans"),
        (
            F.when(
                F.sum("p_spans") > 0,
                F.sum("p_weighted_boiler") / F.sum("p_spans"),
            ).otherwise(F.lit(0.0))
        ).alias("boilerplate_ratio"),
        F.sum("p_nonempty").alias("n_nonempty_turns"),
    )


def stat_records(extracted: DataFrame) -> DataFrame:
    """Global StatRecord-style rollup: one row per metric name
    (count / volume / unit), like the reference's benchmark stats."""
    totals = extracted.agg(
        F.count("*").alias("turns"),
        F.sum("n_spans").alias("spans"),
        F.sum(F.length("extracted_text")).alias("chars"),
    )
    return totals.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("turns_processed").alias("metric"),
                    F.col("turns").cast("long").alias("count"),
                    F.lit("turns").alias("unit"),
                ),
                F.struct(
                    F.lit("spans_emitted").alias("metric"),
                    F.col("spans").cast("long").alias("count"),
                    F.lit("spans").alias("unit"),
                ),
                F.struct(
                    F.lit("chars_extracted").alias("metric"),
                    F.col("chars").cast("long").alias("count"),
                    F.lit("chars").alias("unit"),
                ),
            )
        ).alias("s")
    ).select("s.metric", "s.count", "s.unit")
