"""Portable hashing helpers shared across operators and their oracles.

The engine's deterministic keys (near-dup ids, LSH band keys, sampling
cutoffs, shard salts) must be reproducible by ANY SQL engine so the
driver gate can value-check them — Spark-private hashes (``F.hash``
murmur, ``xxhash64``) are out. The contract below is mirrored in the
DuckDB oracles as ``('0x' || substr(md5(x), 1, 15))::BIGINT``; changing
one side breaks oracle parity AND survivor selection, so it lives in
exactly one place per engine.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_prefix60(col: Column) -> Column:
    """60-bit non-negative integer from the first 15 hex chars of
    ``md5(col)`` — avalanche-mixed like xxhash64 but engine-portable.
    15 hex digits = 60 bits, safely inside BIGINT for both Spark and
    any SQL oracle."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
