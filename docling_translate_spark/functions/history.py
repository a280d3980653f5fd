"""History-folder name parsing (reference ``src/utils.py:126-178``).

The reference scans ``output/`` for folders named
``{filename}_{src}_to_{dest}_{timestamp}``, regex-parses them, reformats
the timestamp, and sorts newest first. The engine's checkpoint table
replaces the scan itself (``sources/checkpoint.py``); the parsing rules
are kept as column expressions for parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# reference pattern, utils.py:146 — filename may contain underscores, so
# the lang/timestamp groups anchor from the end
HISTORY_RE = r"^(.*)_([a-z]{2})_to_([a-z]{2})_(\d{8}_\d{6})$"


def parse_history_names(df: DataFrame, name_col: str = "folder_name") -> DataFrame:
    """Parse folder names into (filename, src, dest, ts_display); rows
    that don't match the pattern are dropped, newest first — the
    reference's load_history_from_disk semantics."""
    c = F.col(name_col)
    parsed = df.select(
        F.regexp_extract(c, HISTORY_RE, 1).alias("filename"),
        F.regexp_extract(c, HISTORY_RE, 2).alias("src"),
        F.regexp_extract(c, HISTORY_RE, 3).alias("dest"),
        F.regexp_extract(c, HISTORY_RE, 4).alias("ts_raw"),
    ).filter(F.col("ts_raw") != "")
    return parsed.select(
        "filename",
        "src",
        "dest",
        F.date_format(
            F.to_timestamp("ts_raw", "yyyyMMdd_HHmmss"), "yyyy-MM-dd HH:mm:ss"
        ).alias("ts_display"),
    ).orderBy(F.col("ts_display").desc(), F.col("filename"))
