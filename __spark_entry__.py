"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-turn main-content extraction over
transcripts derived from sf0.001 ``documents``. ``queries()`` exposes the
implemented operators from SURVEY.md §2; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the SQL-expressible ones (others get the
driver's rows-only check).

Column-name discipline: every computed column is aliased identically in
the Spark query and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

# Boilerplate line battery shared by the Spark query and the DuckDB oracle
# (subset of classify.BOILERPLATE_LINE_REGEX that is regex-dialect neutral).
_BOILER_SQL_RE = r"^\s*([Pp]age\s+\d+(\s+of\s+\d+)?|\d+|[-=_*]{3,})\s*$"
_FORMULA_SQL_RE = r"\\[a-zA-Z]+|\^\{|_\{|&="


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: segment → classify → dedup → map → join-back → reassemble
    per turn, over sf0.001-derived transcripts."""
    from docling_translate_spark.operators.extract import ExtractConfig, extract_turns
    from docling_translate_spark.sources.tables import transcripts_from_documents

    transcripts = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    return extract_turns(transcripts, ExtractConfig(ordered=True))


# ---------------------------------------------------------------------------
# queries — each callable: (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_p1_nonempty_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 non-empty text filter + grouped count (SURVEY §2.2/§2.5)."""
    return (
        _docs(spark, sf_dir)
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_a1_distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 exact dedup + counts (ref core.py:453-455)."""
    return _docs(spark, sf_dir).agg(
        F.count("*").alias("total_texts"),
        F.countDistinct("text").alias("unique_texts"),
    )


def q_a3_char_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 sum-of-lengths per group (ref core.py:489)."""
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.sum(F.length("text")).alias("total_chars"),
            F.count("*").alias("n_docs"),
        )
    )


def q_p3_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 boilerplate drop: decorate each doc with page chrome, then strip
    chrome lines (ref html_generator.py:617-619)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("Page "),
            ((F.col("doc_id") % 40) + 1).cast("string"),
            F.lit(" of 40\n"),
            F.col("text"),
            F.lit("\n---\n42"),
        ).alias("decorated"),
    )
    kept = F.filter(
        F.split("decorated", "\n"),
        lambda ln: ~F.regexp_like(ln, F.lit(_BOILER_SQL_RE)),
    )
    return d.select(
        "doc_id",
        F.array_join(kept, "\n").alias("clean_text"),
        (F.size(F.split("decorated", "\n")) - F.size(kept)).alias("n_dropped"),
    )


def q_p4_formula_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 formula predicate over decorated payloads (ref html_generator.py:20-45)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" x^{2} &= \\frac{a}{b}")),
        )
        .otherwise(F.col("text"))
        .alias("payload"),
    )
    return d.select(
        "doc_id",
        F.regexp_like("payload", F.lit(_FORMULA_SQL_RE))
        .cast("int")
        .alias("is_formula"),
    )


def q_w1_rownum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/A7 stable ordering + per-kind numbering via row_number
    (ref core.py:422, utils.py:64-66)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("turn_rank"),
    )


def q_w2_change_marker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 page-change marker analog: lag-based change detection
    (ref html_generator.py:538-545)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = _events(spark, sf_dir).withColumn(
        "prev_type", F.lag("event_type").over(w)
    )
    return (
        lagged.filter(
            F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_changes"))
    )


def q_j2_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 broadcast equi-join + grouped agg (ref html_generator.py:565-567).

    Decimal sums keep Spark and DuckDB bit-identical."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "inner",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_price"),
        )
    )


def q_j3_left_join_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 probe-with-identity-fallback: left join + coalesce
    (ref html_generator.py:692)."""
    docs = _docs(spark, sf_dir)
    # map side: only 'en' texts get a "translation" (markered)
    map_df = (
        docs.filter(F.col("lang") == "en")
        .select("text")
        .distinct()
        .withColumn("mapped", F.concat(F.lit("<<"), F.col("text"), F.lit(">>")))
    )
    return (
        docs.join(F.broadcast(map_df), on="text", how="left")
        .select(
            "doc_id",
            F.coalesce("mapped", "text").alias("out_text"),
        )
    )


def q_o1_longest_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 longest-first ordering, top-k (ref text_html_generator.py:849-853)."""
    return (
        _docs(spark, sf_dir)
        .orderBy(F.length("text").desc(), F.col("doc_id"))
        .limit(10)
        .select("doc_id", F.length("text").alias("text_len"))
    )


def q_a6_extraction_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 per-conversation rollup of the real extraction pipeline output
    (segment counts, content counts, boilerplate ratio). Not SQL-expressible
    → rows-only check."""
    from docling_translate_spark.operators.extract import extract_turns
    from docling_translate_spark.sources.tables import transcripts_from_documents

    out = extract_turns(transcripts_from_documents(spark, sf_dir))
    return out.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("n_spans").alias("n_spans"),
        F.avg("boilerplate_ratio").alias("avg_boiler"),
    )


def q_extract_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship extraction at sf_dir (rows-only check: segmentation
    semantics are pinned by pytest golden fixtures instead of SQL)."""
    from docling_translate_spark.operators.extract import ExtractConfig, extract_turns
    from docling_translate_spark.sources.tables import transcripts_from_documents

    out = extract_turns(
        transcripts_from_documents(spark, sf_dir), ExtractConfig(ordered=True)
    )
    return out.select("conv_id", "turn_idx", "extracted_text", "n_spans", "boilerplate_ratio")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "p1_nonempty_filter": q_p1_nonempty_filter,
        "a1_distinct_dedup": q_a1_distinct_dedup,
        "a3_char_volume": q_a3_char_volume,
        "p3_boilerplate_strip": q_p3_boilerplate_strip,
        "p4_formula_detect": q_p4_formula_detect,
        "w1_rownum_order": q_w1_rownum_order,
        "w2_change_marker": q_w2_change_marker,
        "j2_broadcast_join": q_j2_broadcast_join,
        "j3_left_join_fallback": q_j3_left_join_fallback,
        "o1_longest_first": q_o1_longest_first,
        "a6_extraction_rollup": q_a6_extraction_rollup,
        "extract_turns": q_extract_turns,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "p1_nonempty_filter": """
            SELECT lang, count(*) AS n_docs
            FROM documents
            WHERE text IS NOT NULL AND trim(text) <> ''
            GROUP BY lang
        """,
        "a1_distinct_dedup": """
            SELECT count(*) AS total_texts,
                   count(DISTINCT text) AS unique_texts
            FROM documents
        """,
        "a3_char_volume": """
            SELECT source,
                   sum(length(text)) AS total_chars,
                   count(*) AS n_docs
            FROM documents
            GROUP BY source
        """,
        "p3_boilerplate_strip": r"""
            WITH d AS (
                SELECT doc_id,
                       'Page ' || CAST(doc_id % 40 + 1 AS VARCHAR)
                       || ' of 40' || chr(10) || text || chr(10)
                       || '---' || chr(10) || '42' AS decorated
                FROM documents
            )
            SELECT doc_id,
                   array_to_string(
                       list_filter(
                           string_split(decorated, chr(10)),
                           ln -> NOT regexp_matches(ln,
                               '^\s*([Pp]age\s+\d+(\s+of\s+\d+)?|\d+|[-=_*]{3,})\s*$')
                       ), chr(10)) AS clean_text,
                   len(string_split(decorated, chr(10)))
                   - len(list_filter(
                           string_split(decorated, chr(10)),
                           ln -> NOT regexp_matches(ln,
                               '^\s*([Pp]age\s+\d+(\s+of\s+\d+)?|\d+|[-=_*]{3,})\s*$')
                       )) AS n_dropped
            FROM d
        """,
        "p4_formula_detect": r"""
            SELECT doc_id,
                   CAST(regexp_matches(
                       CASE WHEN doc_id % 7 = 0
                            THEN text || ' x^{2} &= \frac{a}{b}'
                            ELSE text END,
                       '\\[a-zA-Z]+|\^\{|_\{|&=') AS INT) AS is_formula
            FROM documents
        """,
        "w1_rownum_order": """
            SELECT event_id, user_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS turn_rank
            FROM events
        """,
        "w2_change_marker": """
            WITH lagged AS (
                SELECT user_id, event_type,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS prev_type
                FROM events
            )
            SELECT user_id, count(*) AS n_changes
            FROM lagged
            WHERE prev_type IS NULL OR event_type <> prev_type
            GROUP BY user_id
        """,
        "j2_broadcast_join": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "j3_left_join_fallback": """
            WITH map_side AS (
                SELECT DISTINCT text, '<<' || text || '>>' AS mapped
                FROM documents WHERE lang = 'en'
            )
            SELECT d.doc_id, coalesce(m.mapped, d.text) AS out_text
            FROM documents d LEFT JOIN map_side m ON d.text = m.text
        """,
        "o1_longest_first": """
            SELECT doc_id, length(text) AS text_len
            FROM documents
            ORDER BY length(text) DESC, doc_id
            LIMIT 10
        """,
        # a6_extraction_rollup, extract_turns: rows-only (non-SQL segmentation)
    }
