"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark, runs the matching
``oracle_sql()`` on DuckDB over the same parquet (tables pre-registered as
views), and compares row count, column-name sets, and the order-insensitive
multiset of values (columns sorted by name, like the driver's value-hash).

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import decimal
import math
import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# optional comma-separated query-name filter for focused re-checks,
# e.g. SPARK_GRAFT_ONLY=pii_redact,curation_pipeline
ONLY = {q for q in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if q}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return v
    return str(v)


def row_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm(r[i]) for i in order) for r in rows)


def _arrow_type_map(tbl):
    """Column -> coarse Arrow type string, tz/unit-normalized.

    The driver's value-hash is type-sensitive (round 1: BIGINT vs
    HUGEINT, INT vs BIGINT, DECIMAL(28,2) vs DECIMAL(38,2) all produced
    hash mismatches on bit-identical values), so surface physical-type
    drift between the Spark and DuckDB results as warnings.
    """
    import pyarrow as pa

    out = {}
    for field in tbl.schema:
        t = field.type
        if pa.types.is_timestamp(t):
            out[field.name] = "timestamp"  # tz/unit differences are benign
        elif pa.types.is_large_string(t) or pa.types.is_string(t):
            out[field.name] = "string"
        else:
            out[field.name] = str(t)
    return out


def dtype_warnings(sdf, duck_res):
    try:
        smap = _arrow_type_map(sdf.toArrow())
        dmap = _arrow_type_map(duck_res.arrow())
    except Exception as e:  # arrow conversion not available for some type
        return [f"dtype-check skipped: {e}"]
    warns = []
    for col in sorted(set(smap) & set(dmap)):
        if smap[col] != dmap[col]:
            warns.append(f"dtype {col}: spark={smap[col]} duck={dmap[col]}")
    return warns


def main():
    import __spark_entry__ as entrymod
    from docling_translate_spark.plans.session import build_session

    spark = build_session(app_name="oracle-check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    # data-dependent oracle literals (ann_ivf centroids) replay their
    # recipe over the gate's parquet — point them at THIS run's sf_dir
    # (the driver gates at sf0.01, the env default)
    os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        sdf = fn(spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows  [ok>={0}]")
            if len(srows) == 0:
                failures.append((name, "0 rows"))
            continue
        ddf = con.execute(oracles[name])
        dcols = [d[0] for d in ddf.description]
        drows = ddf.fetchall()
        ok = True
        msgs = []
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"schema {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount {len(srows)} != {len(drows)}")
        if ok:
            sm = row_multiset([tuple(r) for r in srows], scols)
            dm = row_multiset(drows, dcols)
            if sm != dm:
                ok = False
                diff_s = list((sm - dm).items())[:3]
                diff_d = list((dm - sm).items())[:3]
                msgs.append(f"values spark-only={diff_s} duck-only={diff_d}")
        if ok:
            # Driver parity: the gate's value-hash is type-sensitive
            # (BIGINT vs HUGEINT, DECIMAL widths — and round 3 proved a
            # value-equal TIMESTAMP+DECIMAL result can still hash-FAIL),
            # so physical dtype drift is a FAILURE here, not a warning.
            # Only the coarse timestamp tz/unit class stays normalized —
            # timestamp-emitting queries have passed every driver round.
            warns = dtype_warnings(fn(spark, SF_DIR), con.execute(oracles[name]))
            hard = [w for w in warns if not w.startswith("dtype-check skipped")]
            if hard:
                ok = False
                msgs.append("dtype-drift " + "; ".join(hard))
            elif warns:
                msgs.append("WARN " + "; ".join(warns))
        status = "OK " if ok else "FAIL"
        print(f"{name:28s} {status} spark={len(srows)} duck={len(drows)} {'; '.join(msgs)}")
        if not ok:
            failures.append((name, "; ".join(msgs)))

    spark.stop()
    if failures:
        print("\nFAILURES:")
        for n, m in failures:
            print(" ", n, m)
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
