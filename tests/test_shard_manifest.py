"""Deterministic training-order sharding (operators/sampling.py).

Contract: one global (md5(id), id) permutation, shard = rank div size,
identical at any parallelism / bucket count — the two-phase rank must
equal the single global sort it replaces.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from docling_translate_spark.operators.sampling import shard_manifest


def _df(spark, ids, parts=1):
    return spark.createDataFrame(
        [(i,) for i in ids], "doc_id long"
    ).repartition(parts)


def _expected(ids, size):
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    return {i: (r // size, r % size) for r, i in enumerate(order)}


def _got(spark, ids, size, **kw):
    out = shard_manifest(_df(spark, ids, parts=4), size, **kw).collect()
    return {r.doc_id: (r.shard_id, r.pos_in_shard) for r in out}


def test_matches_reference_permutation(spark):
    ids = list(range(100))
    assert _got(spark, ids, 8) == _expected(ids, 8)


def test_every_rank_exactly_once(spark):
    ids = list(range(257))  # crosses shard boundaries unevenly
    got = _got(spark, ids, 10)
    ranks = sorted(s * 10 + p for s, p in got.values())
    assert ranks == list(range(257))


def test_invariant_to_bucket_count_and_partitioning(spark):
    ids = [3, 1000, 7, 42, 99999, 12, 8, 511]
    a = _got(spark, ids, 3, bucket_nibbles=1)
    b = _got(spark, ids, 3, bucket_nibbles=4)
    assert a == b == _expected(ids, 3)


def test_non_contiguous_and_string_castable_ids(spark):
    ids = [10**12 + 7, 5, 88, 10**9]
    assert _got(spark, ids, 2) == _expected(ids, 2)


def test_invalid_params_raise(spark):
    df = _df(spark, [1])
    for size, nib in ((0, 2), (-1, 2), (8, 0), (8, 9)):
        with pytest.raises(ValueError):
            shard_manifest(df, size, bucket_nibbles=nib)


def test_no_global_single_partition_window(spark):
    # the corpus-sized window must be partitioned by bucket; the only
    # unpartitioned window runs over the tiny per-bucket count table
    plan = (
        shard_manifest(_df(spark, list(range(50)), parts=4), 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    wins = re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)", plan)
    row_number_specs = [
        w for w in re.findall(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    ]
    assert row_number_specs, plan
    for spec in row_number_specs:
        assert "_bkt" in spec  # rank window is bucket-partitioned
