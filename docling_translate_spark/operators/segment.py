"""Segmentation operator: transcript turns → exploded span rows.

The reference walks one document at a time and runs regex ``finditer``
loops per file (``src/text_parser.py:117-160``). Here the same kernels run
over Arrow batches of thousands of turns inside ``mapInPandas`` — one
Python-worker crossing for the whole segmentation stage, no per-row UDF
calls, no shuffle (narrow transformation).

Payloads containing NUL bytes are treated as binary and produce no spans
(reference ``src/text_parser.py:533-550``); empty/whitespace payloads
likewise (reference ``src/core.py:426``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from docling_translate_spark.classify import has_nul_byte
from docling_translate_spark.schema import SEGMENT_ROW_SCHEMA
from docling_translate_spark.segmenters import segment_text

_OUT_COLS = [f.name for f in SEGMENT_ROW_SCHEMA.fields]


def _segment_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        cols = {k: [] for k in _OUT_COLS}
        texts = pdf["text"]
        tools = pdf["tool"] if "tool" in pdf else pd.Series([None] * len(pdf))
        for cid, tix, text, tool in zip(pdf["conv_id"], pdf["turn_idx"], texts, tools):
            if text is None or not str(text).strip() or has_nul_byte(str(text)):
                # sentinel row (span_idx = -1): keeps the turn alive through
                # the groupBy reassembly without a second scan + join to
                # restore empty/binary turns
                cols["conv_id"].append(cid)
                cols["turn_idx"].append(tix)
                cols["span_idx"].append(-1)
                cols["text"].append(None)
                cols["start_pos"].append(0)
                cols["end_pos"].append(0)
                cols["translatable"].append(False)
                cols["segment_type"].append("empty")
                cols["line_number"].append(0)
                continue
            for i, seg in enumerate(segment_text(str(text), tool or None)):
                cols["conv_id"].append(cid)
                cols["turn_idx"].append(tix)
                cols["span_idx"].append(i)
                cols["text"].append(seg[0])
                cols["start_pos"].append(seg[1])
                cols["end_pos"].append(seg[2])
                cols["translatable"].append(seg[3])
                cols["segment_type"].append(seg[4])
                cols["line_number"].append(seg[5])
        yield pd.DataFrame(cols, columns=_OUT_COLS)


def segment_turns(transcripts: DataFrame) -> DataFrame:
    """Segment every turn; returns one row per span (SEGMENT_ROW_SCHEMA).

    Narrow (no shuffle): each input partition maps independently, so
    parallelism equals the scan's partitioning — tune upstream with
    ``repartitionByRange('conv_id', 'turn_idx')`` when the source is
    skewed or under-partitioned.
    """
    # Column pruning: only ship what the kernel needs across Arrow.
    slim = transcripts.select("conv_id", "turn_idx", "text", "tool")
    return slim.mapInPandas(_segment_batches, SEGMENT_ROW_SCHEMA)
