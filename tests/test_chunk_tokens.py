"""Sliding token-window chunking (operators/sampling.py::chunk_tokens).

Every expected (start, n_tokens, text) triple is hand-derived from the
documented window rule; the driver-gate DuckDB oracle replays the same
rule, so these fixtures pin the semantics readably.
"""

import pytest

from docling_translate_spark.operators.sampling import chunk_tokens


def _chunks(spark, text, size, stride):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return [
        (r.chunk_idx, r.start_tok, r.n_tokens, r.chunk_text)
        for r in chunk_tokens(df, size=size, stride=stride)
        .orderBy("chunk_idx")
        .collect()
    ]


def _words(n):
    return " ".join(f"w{i}" for i in range(n))


def test_short_doc_one_chunk(spark):
    assert _chunks(spark, "a b c", 8, 4) == [(0, 0, 3, "a b c")]


def test_exact_size_one_chunk(spark):
    got = _chunks(spark, _words(8), 8, 4)
    assert got == [(0, 0, 8, _words(8))]


def test_overlapping_windows(spark):
    # n=10, size=8, stride=4: starts 0 and 4; start 8 is dropped
    # because n - 8 = 2 <= size - stride = 4 (tail already covered)
    got = _chunks(spark, _words(10), 8, 4)
    assert [(c, s, n) for c, s, n, _ in got] == [(0, 0, 8), (1, 4, 6)]
    assert got[1][3] == "w4 w5 w6 w7 w8 w9"


def test_tail_extends_coverage(spark):
    # n=13, size=8, stride=4: start 8 has n-8=5 > 4 -> kept, 5 tokens
    got = _chunks(spark, _words(13), 8, 4)
    assert [(c, s, n) for c, s, n, _ in got] == [(0, 0, 8), (1, 4, 8), (2, 8, 5)]


def test_no_overlap_stride_equals_size(spark):
    got = _chunks(spark, _words(9), 4, 4)
    assert [(s, n) for _, s, n, _ in got] == [(0, 4), (4, 4), (8, 1)]


def test_empty_and_null_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "\t\n "), (5, "\x0b")],
        "doc_id long, text string",
    )
    assert chunk_tokens(df).count() == 0


def test_non_space_whitespace_no_phantom_tokens(spark):
    # trim() strips only spaces: a newline-terminated doc must not
    # grow a phantom ''-token (here it would push n_tokens to 3)
    got = _chunks(spark, "hello world\n", 8, 4)
    assert got == [(0, 0, 2, "hello world")]


def test_invalid_params_raise(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for size, stride in ((8, 0), (8, 9), (0, 0), (8, -1)):
        with pytest.raises(ValueError):
            chunk_tokens(df, size=size, stride=stride)


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunk_tokens(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Window" not in plan
