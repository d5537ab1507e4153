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
    pairs: DataFrame,
    out_cols: list[str],
    qv: str = "qv",
    v: str = "v",
    qnrm: str | None = None,
    nrm: str | None = None,
) -> DataFrame:
    """Project candidate pairs to (out_cols..., cosine) with the shared
    rounded cosine.

    ``qnrm``/``nrm`` name PRE-STAGED per-row norm columns
    (sqrt(dot(x,x)) computed once per relation row before the
    candidate join). With them the per-pair work is ONE 64-dim fold
    (dot(qv,v)) instead of three — the staged-norm recipe
    dedup_embedding_cosine and sem_scored already use, extended to
    every scored_pairs caller (guide §2.3/§1.2: cut the per-task work
    of the scoring stage, which at N·|workload| pairs dominates the
    brute-force-truth and candidate-verify stages). sqrt(dot(v,v)) is
    the identical sequential fold either way, and a*b of the same
    doubles is the same double, so staged cosines are BIT-identical to
    the inline form — the oracle SQL needs no restaging."""
    if (qnrm is None) != (nrm is None):
        # A typo'd column name at any of the ~10 call sites would
        # otherwise silently fall back to the 3-fold inline cosine —
        # a performance regression with no signal (r12 ADVICE).
        raise ValueError(
            "scored_pairs: pass BOTH qnrm and nrm (staged norms) or "
            f"neither; got qnrm={qnrm!r}, nrm={nrm!r}"
        )
    if qnrm is not None and nrm is not None:
        cos = dot(F.col(qv), F.col(v)) / (F.col(qnrm) * F.col(nrm))
    else:
        cos = cosine(F.col(qv), F.col(v))
    return pairs.select(*out_cols, hround(cos, 6).alias("cosine"))
