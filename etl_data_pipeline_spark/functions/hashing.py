"""Engine-portable deterministic hashing.

The cross-engine contract every sampling/dedup operator builds on:
the first 15 hex chars of md5 (60 bits, non-negative in int64) —
identical in Spark ``conv(substr(md5(s),1,15),16,10)`` and DuckDB
``('0x' || substr(md5(s),1,15))::BIGINT``. Used instead of
xxhash64/rand because replayable pipelines (and the DuckDB oracle)
need the SAME buckets on every engine, every run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative int64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_bucket(col: Column, modulus: int) -> Column:
    """Deterministic bucket in [0, modulus) from the 60-bit md5 hash
    of the (stringified) column."""
    return md5_long60(col.cast("string")) % modulus


def sql_md5_long60(expr: str) -> str:
    """DuckDB rendering of md5_long60 for oracle SQL."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
