"""Shared vector expressions for similarity/dedup operators.

Pure Catalyst (zip_with + aggregate fold): JVM-side, codegen-friendly,
and — critically for the oracle — a SEQUENTIAL left-to-right double
accumulation, which matches DuckDB's list_dot_product ordering so
results hash-compare exactly (float sums are order-sensitive;
SURVEY.md §7.4 risk 5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround


def dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
    )


def cosine(x: Column, y: Column) -> Column:
    return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))


def rank_topk(
    scored: DataFrame,
    k: int,
    partition_col: str = "query_id",
    score_col: str = "cosine",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic per-partition top-k: (score desc, id asc) ordering;
    compiles to WindowGroupLimit (rank pushdown — each task keeps only
    its local top-k before the shuffle, so the exchange carries
    O(partitions × k) rows, not all candidates)."""
    w = Window.partitionBy(partition_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def scored_pairs(
    pairs: DataFrame, out_cols: list[str], qv: str = "qv", v: str = "v"
) -> DataFrame:
    """Project candidate pairs to (out_cols..., cosine) with the shared
    rounded cosine."""
    return pairs.select(*out_cols, hround(cosine(F.col(qv), F.col(v)), 6).alias("cosine"))
