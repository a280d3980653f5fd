"""Aggregation / metrics rollups (SURVEY §2.5) — the benchmark-record
analog of the reference's ``TimeRecord``/``StatRecord``
(``src/benchmark.py:18-31``, ``:73-85``) plus per-conversation rollups.

Per-conversation aggregation is the one place long-transcript key skew
bites (a single conversation with 10^6 turns lands on one reducer), so
the rollup is two-phase salted: partial aggregate on (conv_id, salt),
final aggregate on conv_id — the partials are tiny, the hot key fans out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


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


def corpus_profile(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    quantile_pcts: tuple = (25, 50, 75, 90),
) -> DataFrame:
    """Per-group corpus data card — the profiling pass a training-data
    pipeline runs before and after curation (the "data card" every
    corpus release ships: how much of what, from where, how long, how
    duplicated). One row per group:

    ``(group, n_docs, total_chars, distinct_texts, p{q}_len ...)``
    — all BIGINT, so the whole card is hash-exact across engines.

    Exact length quantiles WITHOUT a hot-key sort: the naive plan
    (``row_number`` over the group) sorts every document of a group in
    ONE task — the hot-key window shape dedup_segments' docstring warns
    about, fatal when one source holds 10^10 docs. Instead the lengths
    collapse to a per-(group, length) HISTOGRAM first (agg-shaped,
    map-side combine — a group's 10^10 rows become ≤ max_len distinct
    lengths), and the window runs over histogram rows only: its
    partition size is bounded by the number of distinct lengths, never
    by the corpus. ``p{q}_len`` is the type-1 (lower) quantile — the
    smallest length whose cumulative count reaches ``ceil(q·n/100)``,
    with the rank computed in INTEGER arithmetic (``(q·n + 99) div
    100``), so no FP ever touches the decision.

    ``distinct_texts`` counts distinct md5 fingerprints (NULL text
    folds to '' so every doc counts); ``n_docs - distinct_texts`` is
    the exact-duplicate mass per group. count_distinct plans as a
    two-phase aggregate — scale-safe.

    Rows whose ``group_col`` is NULL are excluded from the card: the
    histogram↔totals equi-joins never match a NULL key — identically in
    Spark and any SQL twin, so the behavior is engine-consistent.
    Coalesce the group column upstream to profile ungrouped rows.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(txt)).cast("long").alias("total_chars"),
        F.count_distinct(F.md5(txt)).alias("distinct_texts"),
    )
    hist = (
        df.select(
            F.col(group_col).alias("_g"), F.length(txt).alias("_len")
        )
        .groupBy("_g", "_len")
        .agg(F.count("*").alias("_c"))
    )
    w = Window.partitionBy("_g").orderBy("_len")
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    # base is one row per group — broadcast, the histogram never
    # reshuffles for the join
    joined = cum.join(F.broadcast(base), "_g")
    quants = joined.groupBy("_g").agg(
        *[
            F.min(
                F.when(
                    F.col("_cum")
                    >= F.expr(f"(n_docs * {int(q)} + 99) div 100"),
                    F.col("_len"),
                )
            )
            .cast("long")
            .alias(f"p{q}_len")
            for q in quantile_pcts
        ]
    )
    return (
        base.join(quants, "_g")
        .select(
            F.col("_g").alias(group_col),
            "n_docs",
            "total_chars",
            "distinct_texts",
            *[f"p{q}_len" for q in quantile_pcts],
        )
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
