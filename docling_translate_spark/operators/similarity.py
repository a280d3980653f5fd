"""Similarity search over an embedding column (``array<float>``).

Two paths, as a training-data pipeline needs at 100 TB:

* brute-force cosine top-k — the exactness baseline: block-wise
  broadcast of the query set against the corpus, dot products via
  ``F.zip_with``/``F.aggregate`` (JVM-side, codegen) — no Python in the
  hot loop;
* LSH-bucketed ANN — random-hyperplane signatures (numpy, Arrow batches)
  so candidate generation is a bucket equi-join; brute-force rescoring
  only inside buckets. This is the scale path: signature build is narrow,
  the join keys are small ints, and AQE splits hot buckets.

Embedding-cosine near-duplicate detection reuses the ANN machinery with a
similarity threshold instead of top-k.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType
from pyspark.sql.window import Window


def _cosine(a, b) -> F.Column:
    """Cosine similarity of two array<float/double> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set, score all
    corpus rows, window top-k per query. Ties break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        _cosine(F.col("qvec"), F.col("cvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """Multi-table random-hyperplane LSH: one (table, bucket) row per
    vector per table (one narrow pass).

    Multi-table is what makes recall workable for low-cosine neighbors:
    per-table collision prob for angle θ is (1-θ/π)^n_planes; L
    independent tables union to 1-(1-p)^L. numpy matmul over the whole
    Arrow batch — thousands of vectors per BLAS call, no per-row Python.
    """
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes * n_tables))
    out_schema = StructType(
        [
            StructField("sid", LongType(), False),
            StructField("table", IntegerType(), False),
            StructField("bucket", LongType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {"sid": pd.array([], dtype="int64"),
                     "table": pd.array([], dtype="int32"),
                     "bucket": pd.array([], dtype="int64")}
                )
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ planes) > 0  # (rows, planes*tables)
            bits = bits.reshape(len(pdf), n_tables, n_planes)
            buckets = (bits.astype(np.int64) * weights).sum(axis=2)  # (rows, tables)
            sids = pdf[id_col].astype("int64").to_numpy()
            yield pd.DataFrame(
                {
                    "sid": np.repeat(sids, n_tables),
                    "table": np.tile(
                        np.arange(n_tables, dtype=np.int32), len(pdf)
                    ),
                    "bucket": buckets.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(gen, out_schema)


def lsh_ann_topk(
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k neighbors: candidates share an LSH bucket in any
    table, rescored exactly inside buckets. Recall rises with more tables
    / fewer planes; cost rises with bucket size — tune to corpus density."""
    sig = hyperplane_signatures(corpus, dim, n_planes, n_tables, id_col, vec_col, seed)
    vecs = corpus.select(F.col(id_col).alias("sid"), F.col(vec_col).alias("vec"))
    tagged = sig.join(vecs, "sid")

    a = tagged.select(
        F.col("sid").alias("query_id"), F.col("vec").alias("qvec"), "table", "bucket"
    )
    b = tagged.select(
        F.col("sid").alias("neighbor_id"), F.col("vec").alias("cvec"), "table", "bucket"
    )
    scored = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("qvec"), F.col("cvec")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold`` via LSH
    buckets (near-dups almost surely collide at high similarity)."""
    sig = hyperplane_signatures(corpus, dim, n_planes, n_tables, id_col, vec_col, seed)
    vecs = corpus.select(F.col(id_col).alias("sid"), F.col(vec_col).alias("vec"))
    tagged = sig.join(vecs, "sid")
    a = tagged.select(F.col("sid").alias("id_a"), F.col("vec").alias("va"), "table", "bucket")
    b = tagged.select(F.col("sid").alias("id_b"), F.col("vec").alias("vb"), "table", "bucket")
    return (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", _cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
