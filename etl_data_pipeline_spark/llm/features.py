"""Training-data feature engineering (SURVEY.md §2.B.1, round-3
additions): the ops that turn raw interaction/event/document tables
into model-ready training sets — negative sampling, recency-decayed
features, quality-weighted resampling. All map-only or
aggregate-shaped; none materializes a user x item or doc x doc
product anywhere.

Determinism contract: anything "random" is the portable 60-bit md5
hash (functions/hashing.py) so every engine, every run, and the
DuckDB oracle draw the SAME samples; anything transcendental (exp) is
rounded BEFORE entering a sum, the same pre-rounding discipline
text_tfidf uses for ln().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.hashing import md5_long60, sql_md5_long60
from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.session import load_table

NEG_K = 4  # negative samples drawn per user
DECAY_TAU_DAYS = 7.0  # recency half-life scale for decayed features
RESAMPLE_MOD = 1_000_000  # hash-bucket resolution for keep decisions
RESAMPLE_FLOOR = 0.1  # minimum keep probability (low-quality trickle)


def recsys_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for recommender-style training:
    for every customer, NEG_K candidate part keys drawn by portable
    hash, minus anything the customer actually bought.

    The scalable shape: candidate generation is MAP-ONLY (explode K
    slots per user; the item universe is never enumerated per user —
    a candidate is hash-arithmetic into [0, n_items)), and the
    positives are removed by ONE anti-join on (user, item). A hash
    collision with a true interaction yields fewer than K negatives
    for that user — the standard accept-undersampling tradeoff, NOT a
    resample loop (a loop would serialize; at 100 TB you draw K+slack
    slots instead). n_items rides in as a 1-row broadcast; part keys
    are contiguous from 0, so every draw is a real item.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    inter = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    n_items = load_table(spark, sf_dir, "part").agg(
        (F.max("p_partkey") + 1).alias("n_items")
    )
    cand = (
        o.select(F.col("o_custkey").alias("user_id"))
        .distinct()
        .crossJoin(F.broadcast(n_items))
        .select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(NEG_K - 1))).alias("slot"),
            "n_items",
        )
        .select(
            "user_id",
            F.col("slot").cast("long").alias("slot"),
            (
                md5_long60(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit(":"),
                        F.col("slot").cast("string"),
                    )
                )
                % F.col("n_items")
            ).alias("neg_item"),
        )
    )
    return cand.join(
        inter,
        (cand.user_id == inter.user_id) & (cand.neg_item == inter.item),
        "left_anti",
    )


def events_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted per-user features: exponentially time-decayed
    value mass (tau = 7 days against the corpus' newest event) plus
    event count and days-since-last-seen — the standard
    feature-engineering aggregate a plain windowless sum cannot
    express (old activity must count less).

    One scan + one shuffle: the reference timestamp is a 1-row
    broadcast; the decay factor is computed per row in codegen. exp()
    is engine-libm-dependent in its last ulp, so the factor is rounded
    (6dp) BEFORE the multiply-sum — the same portability discipline as
    tfidf's ln() — and the order-dependent sum is rounded at the
    output boundary."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.unix_micros("ts")).alias("max_us"))
    age_days = (F.col("max_us") - F.unix_micros(F.col("ts"))) / F.lit(86400e6)
    w = hround(F.exp(-age_days / F.lit(DECAY_TAU_DAYS)), 6)
    return (
        ev.join(F.broadcast(ref))
        .select("user_id", F.col("value"), w.alias("w"), age_days.alias("age_days"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            hround(F.sum(F.col("value") * F.col("w")), 2).alias("decayed_value"),
            hround(F.min("age_days"), 6).alias("days_since_seen"),
        )
    )


def corpus_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus resampling: keep each document with
    probability proportional to its quality score (floored at
    RESAMPLE_FLOOR so low-quality strata keep a trickle), emitting the
    inverse-probability importance weight a loss-weighted trainer
    needs — the DoReMi/quality-upsampling flavor of curation, distinct
    from corpus_split (uniform) and sample_stratified (fixed
    per-language rates).

    Map-only: the keep decision is an integer compare between the
    doc's md5 bucket and its quality-derived threshold — replayable,
    join-free, pushes down like any predicate. Reuses text_quality's
    exact score expression (one source of truth)."""
    from etl_data_pipeline_spark.llm.text_analysis import quality_cols

    docs = load_table(spark, sf_dir, "documents")
    q = hround(quality_cols()["quality_score"], 6)
    keep_prob = F.greatest(F.lit(RESAMPLE_FLOOR), F.least(F.lit(1.0), q))
    thresh = F.floor(keep_prob * RESAMPLE_MOD).cast("long")
    bucket = md5_long60(
        F.concat(F.lit("resample:"), F.col("doc_id").cast("string"))
    ) % F.lit(RESAMPLE_MOD)
    return (
        docs.select(
            "doc_id",
            keep_prob.alias("keep_prob"),
            thresh.alias("thresh"),
            bucket.alias("bucket"),
        )
        .filter(F.col("bucket") < F.col("thresh"))
        .select(
            "doc_id",
            "keep_prob",
            hround(F.lit(1.0) / F.col("keep_prob"), 6).alias("sample_weight"),
        )
    )


QUERIES = {
    "recsys_negative_samples": recsys_negative_samples,
    "events_decayed_value": events_decayed_value,
    "corpus_quality_resample": corpus_quality_resample,
}


def _quality_prob_cte() -> str:
    """DuckDB CTE reducing the SHARED quality-score SQL (single source
    of truth in text_analysis: sql_quality_cte + SQL_QUALITY_SCORE,
    the same rendering text_quality's own oracle uses) to keep_prob."""
    from etl_data_pipeline_spark.llm.text_analysis import (
        SQL_QUALITY_SCORE,
        sql_quality_cte,
    )

    return f"""
        {sql_quality_cte()}, kp AS (
            SELECT doc_id,
                   greatest({RESAMPLE_FLOOR},
                            least(1.0, {sql_round(SQL_QUALITY_SCORE, 6)})) AS keep_prob
            FROM r
        )"""


ORACLE = {
    "recsys_negative_samples": f"""
        WITH inter AS (
            SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ), u AS (
            SELECT DISTINCT o_custkey AS user_id FROM orders
        ), p AS (
            SELECT max(p_partkey) + 1 AS n_items FROM part
        ), cand AS (
            SELECT u.user_id,
                   r.range AS slot,
                   {sql_md5_long60("u.user_id::VARCHAR || ':' || r.range::VARCHAR")}
                       % p.n_items AS neg_item
            FROM u CROSS JOIN range({NEG_K}) r CROSS JOIN p
        )
        SELECT c.user_id, c.slot, c.neg_item
        FROM cand c
        WHERE NOT EXISTS (
            SELECT 1 FROM inter i
            WHERE i.user_id = c.user_id AND i.item = c.neg_item
        )
    """,
    "events_decayed_value": f"""
        WITH ref AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
        w AS (
            SELECT user_id, value,
                   (ref.max_us - epoch_us(ts)) / 86400e6 AS age_days,
                   {sql_round(f"exp(-((ref.max_us - epoch_us(ts)) / 86400e6) / {DECAY_TAU_DAYS})", 6)} AS w
            FROM events CROSS JOIN ref
        )
        SELECT user_id,
               count(*) AS n_events,
               {sql_round("sum(value * w)", 2)} AS decayed_value,
               {sql_round("min(age_days)", 6)} AS days_since_seen
        FROM w
        GROUP BY user_id
    """,
    "corpus_quality_resample": f"""
        WITH {_quality_prob_cte()}
        SELECT doc_id, keep_prob,
               {sql_round("1.0 / keep_prob", 6)} AS sample_weight
        FROM kp
        WHERE {sql_md5_long60("'resample:' || doc_id::VARCHAR")}
                  % {RESAMPLE_MOD}
              < CAST(floor(keep_prob * {RESAMPLE_MOD}) AS BIGINT)
    """,
}
