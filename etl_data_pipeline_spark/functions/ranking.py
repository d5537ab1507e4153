"""Distributed global positions — the shared zipWithIndex recipe.

A global ``row_number()``/``ntile()`` window with no partitioning is
the chief 100 TB scale-killer: Spark executes it by moving the
window's ENTIRE input through one partition. When the sort keys form a
total order, the same dense 1-based positions come out of a
distributed range-partitioned sort + ``zipWithIndex`` (per-partition
offsets + one tiny count job) — every partition keeps working, and the
positions are bit-identical to the window's on every engine. First
proven by export_shuffle (operators/scans.py), now shared by
corpus_interleave and events_rfm.

``ntile_from_position`` is the positional half of the same story:
ntile(k)'s bucket depends only on (rank, N), so a global ntile window
becomes position + pure arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_global_position(
    df: DataFrame, order, pos_col: str = "pos", start: int = 1
) -> DataFrame:
    """``df`` sorted by ``order`` (a list of Column sort expressions
    that MUST form a total order — include a unique tiebreak) with a
    dense ``start``-based long position appended. One distributed
    range sort + zipWithIndex; no single-partition stage. The RDD hop
    serializes rows through Python, so project to the needed columns
    BEFORE calling at scale."""
    ordered = df.orderBy(*order)
    n = len(ordered.columns)
    schema = T.StructType(
        list(ordered.schema.fields) + [T.StructField(pos_col, T.LongType(), False)]
    )
    rdd = ordered.rdd.zipWithIndex().map(
        lambda t, _n=n, _s=start: tuple(t[0][i] for i in range(_n)) + (t[1] + _s,)
    )
    return ordered.sparkSession.createDataFrame(rdd, schema)


def ntile_from_position(
    pos: Column, n_total: int, n_buckets: int, start: int = 1
) -> Column:
    """The 1-based ntile(``n_buckets``) bucket for a ``start``-based
    dense position over ``n_total`` rows — Spark/ANSI ntile semantics
    exactly: the first ``n_total % n_buckets`` buckets take
    ``n_total // n_buckets + 1`` rows, the rest one fewer. Pure
    arithmetic (no window), so it composes with with_global_position
    to replace a global ntile window."""
    q, rem = divmod(n_total, n_buckets)
    cutoff = rem * (q + 1)
    zero = pos - start  # 0-based
    return (
        F.when(zero < cutoff, F.floor(zero / (q + 1)) + 1)
        .otherwise(rem + F.floor((zero - cutoff) / max(q, 1)) + 1)
        .cast("int")
    )
