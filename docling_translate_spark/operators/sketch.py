"""Engine-portable HyperLogLog distinct-count sketch.

The sketch the brief's custom-operator list names ("a novel sketch"):
cardinality estimation for corpus bookkeeping at 10^12 turns — distinct
texts per source, distinct urls per crawl, distinct users per shard —
where exact ``countDistinct`` means shuffling every distinct value and
a sketch's 4096 registers mean shuffling 4 KB per group.

Portability is the design constraint (the same one the MinHash kernel
solves at ``dedup.py``): Spark's built-in ``approx_count_distinct`` is
a private HLL++ whose registers no other engine can reproduce, so it
can never be value-checked. This sketch derives every register from
``md5`` nibbles — Flajolet et al.'s HLL with a hash both Spark and
DuckDB (and any engine with md5 + string ops) compute bit-identically:

- bucket  = first 3 hex nibbles of md5(value)           (m = 4096, p = 12)
- w       = next 13 nibbles as a 52-bit integer
- rank    = leading-zero count of w within 52 bits, + 1, capped at
  ``RANK_CAP`` = 38 (P[rank > 38] = 2^-38: unobservable, and the cap is
  what makes register sums EXACT-integer below)
- register[bucket] = max(rank) over the group's values, with EVERY
  bucket present (rank 0 for never-hit buckets — a complete axis, same
  trick as the NB classifier's weight table)

The estimator is emitted in deterministic integer form: the harmonic
denominator ``sum(2^-rank)`` is scaled by 2^RANK_CAP so each term
``2^(RANK_CAP - rank)`` is an exact BIGINT (max sum = 4096·2^38 = 2^50
— no overflow, no float accumulation, order-free, so Spark and DuckDB
agree bit-for-bit at any parallelism), and the raw HLL estimate is ONE
double division by that exact integer, floored to BIGINT. The
small-range (linear-counting) correction deliberately stays OUT of the
gate columns: it needs ``ln``, and libm's ``ln`` is not guaranteed
identically rounded across engines — ``v_zero`` is emitted instead so
consumers can apply ``m·ln(m/v_zero)`` when ``estimate < 2.5m``
(:func:`hll_corrected` does exactly that, driver-side).

Registers are max-mergeable: union two register tables and take
``max(rank)`` per (group, bucket) — the committed-snapshot recipe
(:func:`hll_merge`), constant size per group forever.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_registers", "hll_merge", "hll_estimate", "hll_distinct", "hll_corrected"]

M = 4096  # registers (p = 12 bits, nibble-aligned so bucket = 3 hex chars)
RANK_CAP = 38
W_BITS = 52  # 13 hex nibbles
# alpha_m for m >= 128 (Flajolet et al. 2007); the whole numerator of the
# raw estimate is ONE Python double so both engines divide the same value
ALPHA = 0.7213 / (1.0 + 1.079 / M)
EST_NUMERATOR = ALPHA * M * M * float(2**RANK_CAP)


def _rank(col) -> "F.Column":
    """Rank = 52-bit leading zeros of the md5 tail + 1, capped.

    ``length(bin(w))`` is the exact bit length (both engines render
    binary without leading zeros; bin(0) = '0' has length 1, so w = 0
    lands on 52 and the cap folds it to RANK_CAP — no special case).
    """
    h = F.md5(col)
    w = F.conv(F.substring(h, 4, 13), 16, 10).cast("long")
    return F.least(
        F.lit(W_BITS + 1) - F.length(F.bin(w)), F.lit(RANK_CAP)
    ).alias("rank")


def hll_registers(
    df: DataFrame, value_col: str, group_cols: Sequence[str]
) -> DataFrame:
    """Dense register table: one row per (group, bucket) for ALL
    ``M`` buckets, ``rank`` = max observed (0 for never-hit buckets).

    NULL values hash to NULL and are excluded (a NULL contributes no
    distinct value). The aggregation is map-side combined — at any
    scale each task emits at most M rows per group before the exchange.
    """
    group_cols = list(group_cols)
    h = F.md5(F.col(value_col))
    sparse = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.conv(F.substring(h, 1, 3), 16, 10).cast("long").alias("bucket"),
            _rank(F.col(value_col)),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("rank"))
    )
    axis = (
        df.select(*group_cols)
        .distinct()
        .crossJoin(F.broadcast(df.sparkSession.range(M).select(F.col("id").alias("bucket"))))
    )
    return axis.join(sparse, [*group_cols, "bucket"], "left").select(
        *group_cols, "bucket", F.coalesce("rank", F.lit(0)).cast("long").alias("rank")
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge register tables (same schema) by max rank per (group,
    bucket) — the incremental-snapshot path: keep one register table
    per committed corpus, union with each ingest batch's table, merge.
    Lossless w.r.t. computing the sketch over the unioned raw data."""
    if not register_tables:
        raise ValueError("need at least one register table")
    u = register_tables[0]
    for t in register_tables[1:]:
        u = u.unionByName(t)
    keys = [c for c in u.columns if c != "rank"]
    return u.groupBy(*keys).agg(F.max("rank").alias("rank"))


def hll_estimate(registers: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Per-group estimate columns, all deterministic integers:

    - ``v_zero``: untouched registers (input to the small-range
      correction, applied driver-side by :func:`hll_corrected`)
    - ``hll_units``: exact-integer harmonic denominator
      ``sum(2^(RANK_CAP - rank))`` (BIGINT, order-free)
    - ``hll_estimate``: ``floor(EST_NUMERATOR / hll_units)`` — the raw
      HLL estimate, one IEEE division of identical operands in any
      engine
    """
    group_cols = list(group_cols)
    # 2^(cap - rank) via pow: exact in double up to 2^52, exact cast
    units = F.pow(F.lit(2.0), F.lit(RANK_CAP) - F.col("rank")).cast("long")
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.sum(F.when(F.col("rank") == 0, 1).otherwise(0)).alias("v_zero"),
            F.sum(units).alias("hll_units"),
        )
        .select(
            *group_cols,
            F.col("v_zero").cast("long").alias("v_zero"),
            F.col("hll_units").cast("long").alias("hll_units"),
            F.floor(F.lit(EST_NUMERATOR) / F.col("hll_units"))
            .cast("long")
            .alias("hll_estimate"),
        )
    )


def hll_distinct(
    df: DataFrame, value_col: str, group_cols: Sequence[str]
) -> DataFrame:
    """Registers + estimate in one call (fresh sketch over ``df``)."""
    return hll_estimate(hll_registers(df, value_col, group_cols), group_cols)


def hll_corrected(row_estimate: int, v_zero: int) -> float:
    """Driver-side small-range correction (linear counting) for one
    group's emitted columns: HLL's raw estimator biases high under
    ~2.5m distinct values; when in that range and some registers are
    untouched, ``m * ln(m / v_zero)`` is the standard replacement.
    Kept out of the distributed plan ON PURPOSE: libm ``ln`` is not
    identically rounded across engines, and the gate output must be."""
    if row_estimate <= 2.5 * M and v_zero > 0:
        return M * math.log(M / v_zero)
    return float(row_estimate)
