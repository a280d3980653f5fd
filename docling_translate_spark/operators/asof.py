"""As-of (time-travel) join — attach the most recent build-side row at
or before each probe row's timestamp, per key.

The classic analytics operator Spark's DataFrame API lacks (pandas
``merge_asof``, DuckDB ``ASOF JOIN``, kdb ``aj``): for transcripts it is
"attach the latest preceding tool result / state snapshot to every
turn"; for event streams "join each reading to the last config change".
The reference repo has no temporal joins at all — this is an engine
addition in the spirit of its history scan (``src/utils.py:176-178``,
newest-first selection), generalized to per-row temporal matching.

Scale design — why not the obvious window
-----------------------------------------
The textbook Spark rewrite (union both sides, one window per key
ordered by time, ``last(payload, ignorenulls)``) puts EVERY row of a
hot key into ONE task for the sort: a key with 10^8 events at 10^12
rows melts exactly like the hot-fingerprint window ``dedup_segments``'
docstring warns about. This implementation bounds every event-level
task by time-bucketing:

1. LOCAL pass: rows are assigned ``bucket = ts div bucket_width`` and
   the union-window runs over ``(key, bucket)`` — task size is capped
   by events-per-key-per-bucket, tunable via ``bucket_width``, and AQE
   splits any residual skew because the partition key has bounded
   cardinality per task.
2. CARRY pass: per ``(key, bucket)`` the LATEST build row is reduced to
   one summary row (``max(struct(ts, payload))`` — map-side combine, an
   aggregation, never a sort). A second window orders these SLIM
   summary rows by bucket per key — one row per non-empty bucket, so a
   key with 10^8 events in 10^4 buckets sorts 10^4 summary rows, not
   10^8 events — and takes the running latest over ALL PRECEDING
   buckets (``rowsBetween(unboundedPreceding, -1)``).
3. Final: ``coalesce(local_match, carry_in)`` per probe row, with an
   optional ``tolerance`` that nulls out matches older than
   ``probe.ts - tolerance``.

Determinism: build rows are pre-aggregated to ONE row per (key, ts) by
``max(struct(*payload))`` before matching, so ties at identical
timestamps resolve identically at any parallelism and in any SQL
engine (DuckDB's ASOF JOIN leaves same-timestamp winners unspecified;
the pre-aggregation removes the ambiguity on both sides). Equal
timestamps match (backward-inclusive, ``probe.ts >= build.ts``), the
ASOF JOIN convention.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def _micros(df: DataFrame, ts_col: str) -> "F.Column":
    """Event-time as exact BIGINT microseconds. TIMESTAMP_NTZ is
    measured against an NTZ epoch literal via timestampdiff — tz-free,
    so the result never routes through the session timezone (the
    convention every gate query on the events table follows; a plain
    epoch cast would shift with the session tz). Integer columns are
    taken as already-micros."""
    dt = dict(df.dtypes)[ts_col]
    if dt == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    if dt == "timestamp":
        return F.unix_micros(F.col(ts_col))
    return F.col(ts_col).cast("long")


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: Sequence[str],
    bucket_width: int = 3_600_000_000,
    tolerance: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join: for every ``probe`` row, attach
    the payload of the latest ``build`` row with the same ``key_col``
    and ``build.ts <= probe.ts`` (micros precision), or NULLs if none
    (left semantics — every probe row survives).

    Output = all ``probe`` columns plus ``{prefix}ts`` (matched build
    time, BIGINT micros) and ``{prefix}{c}`` for each payload column.

    ``bucket_width`` is in MICROSECONDS (default 1 hour) and is the
    skew knob: event-level sorts are bounded by rows-per-key-per-bucket.
    ``tolerance`` (micros, optional) rejects matches older than
    ``probe.ts - tolerance`` (the pandas ``merge_asof`` meaning).

    Preconditions: ``ts_col`` is a timestamp (or exact integer micros)
    with non-negative epoch; probe columns must not collide with the
    ``{prefix}*`` output names or the internal ``_aj_*`` temps.
    """
    payload_cols = list(payload_cols)
    reserved = [c for c in probe.columns if c.startswith(("_aj_", prefix))]
    if reserved:
        raise ValueError(f"probe carries reserved columns: {reserved}")

    t_probe = _micros(probe, ts_col).alias("_aj_t")
    t_build = _micros(build, ts_col).alias("_aj_t")

    # ONE build row per (key, ts): deterministic tie winner, and the
    # payload travels as a single struct from here on
    bd = (
        build.select(F.col(key_col).alias("_aj_k"), t_build, *payload_cols)
        .groupBy("_aj_k", "_aj_t")
        .agg(F.max(F.struct(*payload_cols)).alias("_aj_pay"))
    )

    width = F.lit(int(bucket_width))
    pb = probe.select(
        "*",
        F.col(key_col).alias("_aj_k"),
        t_probe,
        F.lit(1).alias("_aj_tag"),
        F.lit(None).cast(bd.schema["_aj_pay"].dataType).alias("_aj_pay"),
    )
    bd_tagged = bd.select(
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe.columns],
        "_aj_k",
        "_aj_t",
        F.lit(0).alias("_aj_tag"),
        "_aj_pay",
    )
    u = pb.unionByName(bd_tagged).withColumn(
        "_aj_b", F.expr(f"_aj_t div {int(bucket_width)}")
    )

    # local pass: bounded (key, bucket) partitions; build rows sort
    # before probe rows at equal ts (tag 0 < 1) -> inclusive backward
    w_local = (
        Window.partitionBy("_aj_k", "_aj_b")
        .orderBy("_aj_t", "_aj_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = u.withColumn(
        "_aj_local",
        F.last(F.when(F.col("_aj_tag") == 0, F.struct("_aj_t", "_aj_pay")), ignorenulls=True).over(
            w_local
        ),
    ).filter(F.col("_aj_tag") == 1)

    # carry pass: slim summaries only — one row per (key, bucket) that
    # HAS build rows; running latest over all preceding buckets
    summ = bd.withColumn("_aj_b", F.expr(f"_aj_t div {int(bucket_width)}")).groupBy(
        "_aj_k", "_aj_b"
    ).agg(F.max(F.struct("_aj_t", "_aj_pay")).alias("_aj_mx"))
    buckets = u.select("_aj_k", "_aj_b").distinct()
    w_carry = (
        Window.partitionBy("_aj_k")
        .orderBy("_aj_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        buckets.join(summ, ["_aj_k", "_aj_b"], "left")
        .withColumn("_aj_carry", F.last("_aj_mx", ignorenulls=True).over(w_carry))
        .select("_aj_k", "_aj_b", "_aj_carry")
    )

    out = local.join(carry, ["_aj_k", "_aj_b"], "left").withColumn(
        "_aj_m", F.coalesce("_aj_local", "_aj_carry")
    )
    if tolerance is not None:
        out = out.withColumn(
            "_aj_m",
            F.when(
                F.col("_aj_m._aj_t") >= F.col("_aj_t") - F.lit(int(tolerance)),
                F.col("_aj_m"),
            ),
        )
    matched = [F.col("_aj_m._aj_t").alias(f"{prefix}ts")] + [
        F.col(f"_aj_m._aj_pay.{c}").alias(f"{prefix}{c}") for c in payload_cols
    ]
    return out.select(*probe.columns, *matched)
