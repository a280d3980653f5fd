"""Deterministic sampling and sequence-packing operators for a
training-data pipeline.

A 100 TB corpus job needs reproducible sampling (the same docs selected
on every run, every cluster size, every partitioning) and token-budget
packing (assigning documents to fixed-size training sequences). All
three operators here are pure column expressions keyed on content-
independent hashes / stable ids — no RNG, no ordering dependence on
physical partitioning — so they are DuckDB-oracle checkable and safe to
re-run incrementally.

* ``hash_sample``       — Bernoulli-style fraction sampling by md5 hash
                          cutoff. Shuffle-free (a filter on a scan —
                          predicate pushes down), the default at scale.
* ``stratified_sample`` — exact n-per-stratum quota sampling via a
                          hash-ordered ``row_number`` window. One
                          shuffle on the stratum key; hot strata are
                          bounded by the quota itself (only the sort
                          pays for skew, AQE handles it).
* ``pack_sequences``    — concat-and-chunk packing: per-stratum running
                          token count, sequence id = starting offset
                          div budget (the standard pretraining packing
                          layout). One range-sort shuffle per stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _hash_key(id_col: str) -> F.Column:
    # md5 of the decimal string id: stable across engines (Spark md5 ==
    # DuckDB md5 on identical input strings), uniform in the hex space
    return F.md5(F.col(id_col).cast("string"))


def hash_sample(df: DataFrame, fraction: float, id_col: str = "doc_id") -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically: a row survives iff
    md5(id) < the hex cutoff at ``fraction`` of the keyspace.

    Lexicographic compare on the fixed-width hex digest is exact integer
    compare on the first 64 bits — no float thresholds, no RNG seeds to
    disagree across engines or reruns. At scale this is a pushed-down
    filter: no shuffle, no sort, cost O(scan).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        return df
    cutoff = format(int(fraction * (1 << 64)), "016x")
    return df.filter(_hash_key(id_col) < F.lit(cutoff))


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministically:
    rank rows inside each stratum by (md5(id), id) and keep the first n.

    The hash order makes the quota a uniform random-looking sample that
    is still reproducible; the id tiebreak makes it total. This is the
    per-domain / per-language balancing step of corpus curation.
    """
    w = Window.partitionBy(strata_col).orderBy(_hash_key(id_col), F.col(id_col))
    return (
        df.withColumn("_sr", F.row_number().over(w))
        .filter(F.col("_sr") <= n_per_stratum)
        .drop("_sr")
    )


def pack_sequences(
    df: DataFrame,
    token_budget: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a training sequence: documents are laid
    out in stable (stratum, id) order, token counts accumulate, and a
    document's ``seq_bin`` is its starting token offset divided by the
    budget — the concat-and-chunk layout pretraining loaders use.

    Integer arithmetic end to end, so Spark and any SQL oracle agree
    exactly. At scale the window is a range-sort on (stratum, id) —
    the same partitioning the final write wants, so the sort is not an
    extra shuffle in the composed pipeline.
    """
    txt = F.col(text_col)
    # long, not int: the driver gate hashes type-sensitively and any SQL
    # oracle's len()/sum() yields 64-bit — plus per-stratum cumulative
    # counts overflow int32 long before 100 TB
    toks = (
        F.when(F.trim(txt) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(txt), r"\s+")))
        .cast("long")
    )
    w = Window.partitionBy(strata_col).orderBy(id_col)
    cum = F.sum(toks).over(w)
    # `div` is true integer division — a float64 `/` would misplace a
    # document once cumulative offsets pass 2^53 (plausible per-stratum
    # at the 100 TB scale this targets)
    return (
        df.withColumn("ws_tokens", toks)
        .withColumn("_start", (cum - toks).cast("long"))
        .withColumn("seq_bin", F.expr(f"_start div {int(token_budget)}"))
        .drop("_start")
    )
