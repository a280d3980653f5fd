"""Deterministic sampling + sequence packing: reproducibility across
partitionings, quota exactness, packing arithmetic, repetition gates."""

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.sampling import (
    hash_sample,
    pack_sequences,
    stratified_sample,
)
from docling_translate_spark.operators.text_analysis import repetition_features

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_hash_sample_deterministic_and_partition_independent(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.25).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(17), 0.25).select("doc_id").collect()
    }
    assert a == b and a
    # roughly the requested fraction (md5 is uniform)
    n = docs.count()
    assert 0.15 * n <= len(a) <= 0.35 * n


def test_hash_sample_nested(spark, docs):
    """A smaller fraction is a subset of a larger one (same keyspace
    prefix) — lets a pipeline grow a sample without resampling."""
    small = {r["doc_id"] for r in hash_sample(docs, 0.1).select("doc_id").collect()}
    big = {r["doc_id"] for r in hash_sample(docs, 0.3).select("doc_id").collect()}
    assert small <= big


def test_hash_sample_edges(spark, docs):
    n = docs.count()
    assert hash_sample(docs, 1.0).count() == n
    assert hash_sample(docs, 0.0).count() == 0
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_stratified_sample_quota(spark, docs):
    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    got = (
        stratified_sample(docs, 7)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {r["source"]: r["n"] for r in got} == {
        s: min(7, n) for s, n in sizes.items()
    }
    # reproducible under different physical partitioning
    a = {tuple(r) for r in stratified_sample(docs, 7).select("source", "doc_id").collect()}
    b = {
        tuple(r)
        for r in stratified_sample(docs.repartition(13), 7)
        .select("source", "doc_id")
        .collect()
    }
    assert a == b


def test_pack_sequences_arithmetic(spark, docs):
    """seq_bin must equal floor(start_offset / budget) for the stable
    (source, doc_id) layout, recomputed independently in Python."""
    budget = 512
    rows = (
        pack_sequences(docs, budget)
        .select("source", "doc_id", "ws_tokens", "seq_bin")
        .collect()
    )
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["doc_id"])
        start = 0
        prev_bin = 0
        for r in rs:
            assert r["seq_bin"] == start // budget, (src, r["doc_id"])
            assert r["seq_bin"] >= prev_bin  # bins never go backwards
            prev_bin = r["seq_bin"]
            start += r["ws_tokens"]


def test_pack_sequences_two_phase_matches_single_window(spark, docs):
    """The bucketed two-phase prefix sum must reproduce the one-window-
    per-stratum layout exactly, at any bucket count."""
    base = {
        (r["doc_id"]): (r["ws_tokens"], r["seq_bin"])
        for r in pack_sequences(docs, 512, n_buckets=1)
        .select("doc_id", "ws_tokens", "seq_bin")
        .collect()
    }
    for nb in (2, 7, 32):
        got = {
            (r["doc_id"]): (r["ws_tokens"], r["seq_bin"])
            for r in pack_sequences(docs, 512, n_buckets=nb)
            .select("doc_id", "ws_tokens", "seq_bin")
            .collect()
        }
        assert got == base, f"n_buckets={nb}"


def test_pack_sequences_parallelizes_within_stratum(spark, docs):
    """The heavy window must partition on (stratum, bucket), not just the
    stratum — >1 task per stratum on a 2-source input is the whole point
    of the two-phase plan."""
    import contextlib
    import io

    two = docs.filter(F.col("source").isin("wiki", "web"))
    df = pack_sequences(two, 512, n_buckets=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert "hashpartitioning(source#" in plan.replace("source ", "source#"), plan
    # the big window's exchange carries the bucket column
    assert "_bkt" in plan, plan
    wide_windows = [
        l for l in plan.splitlines()
        if "Window" in l and "ws_tokens" in l and "_bkt" in l
    ]
    assert wide_windows, plan


def test_repetition_fixtures(spark):
    df = spark.createDataFrame(
        [
            (1, "a\na\nb"),          # 3 lines, one dup pair
            (2, "x y x y"),          # bigrams: x y / y x / x y
            (3, ""),                 # degenerate
            (4, "unique lines\nonly here"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r
        for r in repetition_features(df)
        .select("doc_id", "n_lines", "dup_line_ratio", "top_bigram_ratio")
        .collect()
    }
    assert got[1]["n_lines"] == 3
    assert abs(got[1]["dup_line_ratio"] - 1 / 3) < 1e-12
    assert abs(got[2]["top_bigram_ratio"] - 2 / 3) < 1e-12
    assert got[3]["dup_line_ratio"] == 0.0
    assert got[3]["top_bigram_ratio"] == 0.0
    assert got[4]["dup_line_ratio"] == 0.0


def test_pack_sequences_string_id_falls_back(spark, docs):
    """Non-integral id: cast-to-bigint yields NULL and the bucketed plan's
    equi-join would silently drop EVERY row (r2 ADVICE) — pack_sequences
    must fall back to the single-window plan instead."""
    sdocs = docs.withColumn(
        "sid", F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
    )
    base = {
        r["sid"]: (r["ws_tokens"], r["seq_bin"])
        for r in pack_sequences(sdocs, 512, id_col="sid", n_buckets=1)
        .select("sid", "ws_tokens", "seq_bin")
        .collect()
    }
    got = {
        r["sid"]: (r["ws_tokens"], r["seq_bin"])
        for r in pack_sequences(sdocs, 512, id_col="sid", n_buckets=32)
        .select("sid", "ws_tokens", "seq_bin")
        .collect()
    }
    assert got and got == base


# --- DSIR importance resampling ---------------------------------------


@pytest.fixture(scope="module")
def dsir_corpora(spark):
    """Raw corpus = mostly 'legal' template docs + a few 'science' docs;
    target corpus = science only. DSIR must rank the science-looking raw
    docs above the legal ones."""
    sci = "the quantum model predicts particle spin states under entanglement"
    law = "the party of the first part shall indemnify the aforementioned party"
    raw = [(i, sci if i % 10 == 0 else law) for i in range(100)]
    tgt = [(1000 + i, f"quantum spin entanglement model predicts states {i}") for i in range(20)]
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(tgt, "doc_id long, text string")
    return rdf, tdf


def test_dsir_ranks_targetlike_docs_higher(spark, dsir_corpora):
    from docling_translate_spark.operators.sampling import dsir_weights

    raw, tgt = dsir_corpora
    rows = {r["doc_id"]: r for r in dsir_weights(raw, tgt).collect()}
    assert len(rows) == 100
    sci_w = [rows[i]["log_weight"] for i in range(0, 100, 10)]
    law_w = [rows[i]["log_weight"] for i in range(100) if i % 10 != 0]
    assert min(sci_w) > max(law_w)


def test_dsir_select_topk_deterministic(spark, dsir_corpora):
    from docling_translate_spark.operators.sampling import dsir_select

    raw, tgt = dsir_corpora
    # exactly the 10 science docs look like the target
    picked = {r["doc_id"] for r in dsir_select(raw, tgt, 10).collect()}
    assert picked == {i for i in range(0, 100, 10)}
    # partition-independent (content-keyed hashing, exact integer sums)
    again = {
        r["doc_id"] for r in dsir_select(raw.repartition(13), tgt, 10).collect()
    }
    assert again == picked


def test_dsir_empty_and_single_token_docs(spark):
    from docling_translate_spark.operators.sampling import dsir_weights

    raw = spark.createDataFrame(
        [(1, ""), (2, None), (3, "solo"), (4, "two tokens")],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame([(9, "two tokens here")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dsir_weights(raw, tgt).collect()}
    assert rows[1]["n_grams"] == 0 and rows[1]["log_weight"] == 0.0
    assert rows[2]["n_grams"] == 0 and rows[2]["log_weight"] == 0.0
    assert rows[3]["n_grams"] == 1  # unigram only — no bigram from one token
    assert rows[4]["n_grams"] == 3  # 2 unigrams + 1 bigram
