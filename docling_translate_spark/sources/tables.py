"""Table loaders over the driver-provided parquet testdata, plus the
deterministic derivation of a transcript-shaped table from ``documents``.

The real deployment reads an Iceberg transcript table
(``BASELINE.json`` ``input_hint``); in-sandbox the same shape is derived
from ``documents.parquet`` with pure column expressions — fully
deterministic, so Spark-side and DuckDB-oracle-side derivations agree
byte-for-byte. The decoration embeds the reference's six parser families
(markdown fences, python docstrings/comments, c-style comments, shell
shebang+comments, config blobs, boilerplate page chrome, LaTeX formulas)
into the payloads so the extraction operators have real work to do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the ``input_hint`` transcript table from ``documents``.

    conv_id = source, turn_idx = dense order of doc_id within source.
    Payload decoration cycles through the parser families keyed on
    ``doc_id % 6`` (plus a formula tail for ``doc_id % 7 == 0``) — all
    pure column expressions, no UDFs, no randomness.
    """
    docs = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id") % 6
    did = F.col("doc_id").cast("string")
    body = F.col("text")
    head80 = F.substring("text", 1, 80)

    decorated = (
        F.when(
            k == 0,
            F.concat(
                F.lit("Page "),
                ((F.col("doc_id") % 40) + 1).cast("string"),
                F.lit(" of 40\n"),
                body,
                F.lit("\n---\n© 2024 ExampleCorp"),
            ),
        )
        .when(
            k == 1,
            F.concat(
                F.lit("# Doc "), did, F.lit("\n\n"), body,
                F.lit("\n\n```python\nx = "), did, F.lit("\nprint(x)\n```"),
            ),
        )
        .when(
            k == 2,
            F.concat(
                F.lit('"""Doc '), did, F.lit(".\n"), head80,
                F.lit('\n"""\n# note '), did,
                F.lit("\ndef f():\n    return "),
                (F.col("doc_id") % 13).cast("string"),
            ),
        )
        .when(
            k == 3,
            F.concat(
                F.lit("// note "), did, F.lit("\nint main() {\n  /* "),
                head80, F.lit(" */\n  return 0;\n}"),
            ),
        )
        .when(
            k == 4,
            F.concat(
                F.lit("#!/bin/bash\n# "), head80, F.lit("\necho "), did
            ),
        )
        .otherwise(body)
    )
    # every 7th doc gets a LaTeX tail paragraph (formula classification)
    decorated = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(decorated, F.lit("\n\nx^{2} + y_{i} &= \\frac{a}{b}")),
    ).otherwise(decorated)

    tool = (
        F.when(k == 2, F.lit("python"))
        .when(k == 3, F.lit("cpp"))
        .when(k == 4, F.lit("bash"))
        .otherwise(F.lit(""))
    )
    role_arr = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"))
    w = Window.partitionBy("source").orderBy("doc_id")

    return docs.select(
        F.col("source").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.element_at(role_arr, (F.col("doc_id") % 3 + 1).cast("int")).alias("role"),
        decorated.alias("text"),
        tool.alias("tool"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(secs=F.col("doc_id").cast("double"))
        ).alias("ts"),
    )
