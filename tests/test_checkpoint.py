"""Checkpoint / lineage / resume semantics (FIXTURES.md §3):
crash mid-run, rerun, assert no duplicate (conv_id, turn_idx) rows and
full parity with an uncheckpointed run."""

import tempfile

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.extract import extract_turns
from docling_translate_spark.operators.metrics import conversation_rollup, stat_records
from docling_translate_spark.schema import TRANSCRIPT_SCHEMA
from docling_translate_spark.sources.checkpoint import (
    SimulatedFailure,
    committed_units,
    read_lineage,
    read_output,
    run_extraction,
)
from docling_translate_spark.synth import gen_rows


@pytest.fixture(scope="module")
def transcripts(spark):
    return spark.createDataFrame(gen_rows(30, 5), TRANSCRIPT_SCHEMA).cache()


def test_resume_after_crash(spark, transcripts):
    tmp = tempfile.mkdtemp(prefix="dts-ckpt-")
    out_dir, ckpt_dir = f"{tmp}/out", f"{tmp}/ckpt"

    with pytest.raises(SimulatedFailure):
        run_extraction(
            spark, transcripts, out_dir, ckpt_dir, run_id="r1",
            n_units=4, fail_after_units=2,
        )
    assert committed_units(spark, ckpt_dir, "r1") == {0, 1}

    # resume: only the remaining units run
    done = run_extraction(
        spark, transcripts, out_dir, ckpt_dir, run_id="r1", n_units=4
    )
    assert done == {2, 3}
    assert committed_units(spark, ckpt_dir, "r1") == {0, 1, 2, 3}

    out = read_output(spark, out_dir)
    # idempotency: no duplicate turns
    n = out.count()
    assert out.select("conv_id", "turn_idx").distinct().count() == n
    # parity with a direct uncheckpointed run
    direct = extract_turns(transcripts)
    assert n == direct.count()
    diff = out.drop("unit").exceptAll(direct).count()
    assert diff == 0

    # lineage rows: one per unit with sane metrics
    lin = read_lineage(spark, ckpt_dir).collect()
    assert len(lin) == 4
    assert sum(r["turns_processed"] for r in lin) == n
    assert all(r["run_id"] == "r1" for r in lin)


def test_rerun_noop(spark, transcripts):
    tmp = tempfile.mkdtemp(prefix="dts-ckpt2-")
    out_dir, ckpt_dir = f"{tmp}/out", f"{tmp}/ckpt"
    first = run_extraction(spark, transcripts, out_dir, ckpt_dir, "r1", n_units=3)
    assert first == {0, 1, 2}
    again = run_extraction(spark, transcripts, out_dir, ckpt_dir, "r1", n_units=3)
    assert again == set()  # fully committed → nothing to do


def test_conversation_rollup_salted(spark, transcripts):
    ext = extract_turns(transcripts).cache()
    rolled = {r["conv_id"]: r for r in conversation_rollup(ext).collect()}
    plain = {
        r["conv_id"]: r
        for r in ext.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum("n_spans").alias("n_spans"),
        )
        .collect()
    }
    assert set(rolled) == set(plain)
    for cid, r in rolled.items():
        assert r["n_turns"] == plain[cid]["n_turns"]
        assert r["n_spans"] == plain[cid]["n_spans"]
        assert 0.0 <= r["boilerplate_ratio"] <= 1.0


def test_stat_records(spark, transcripts):
    ext = extract_turns(transcripts)
    stats = {r["metric"]: r["count"] for r in stat_records(ext).collect()}
    assert stats["turns_processed"] == transcripts.count()
    assert stats["spans_emitted"] > 0
    assert stats["chars_extracted"] > 0
