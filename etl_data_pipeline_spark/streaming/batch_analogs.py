"""Batch-equivalent forms of the streaming operators (SURVEY.md §2.B
"Streaming").

Structured Streaming queries can't be collected by the correctness
harness, so each streaming operator is registered here as its exact
batch analog over the ``events`` table (same operators — ``F.window``,
``F.session_window``, watermark-filter, dropDuplicates — executed in
batch mode). The REAL streaming jobs (readStream → writeStream with
watermarks, availableNow) live in streaming/jobs.py and are exercised
by tests/test_streaming.py; Spark guarantees the windowed aggregation
semantics are identical between the two modes.

Window starts are emitted as formatted strings so the Spark↔DuckDB
comparison is representation-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.session import load_table

_FMT = "yyyy-MM-dd HH:mm:ss"
_DFMT = "%Y-%m-%d %H:%M:%S"


def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts (F.window — epoch-aligned, the
    same operator Structured Streaming incrementalizes)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            hround(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1 hour wide, sliding every 15 minutes — each
    event lands in 4 windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "n_events",
        )
    )


def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user, 30-minute inactivity gap
    (F.session_window — the same stateful operator streaming uses)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            hround(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _FMT).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the event-time watermark late-data drop: with a
    10-minute watermark, only events newer than max(ts) - 10min are
    still mutable; this emits the tumbling counts restricted to that
    live region (the streaming analog of the reference's incremental
    watermark, SURVEY.md §2.B)."""
    ev = load_table(spark, sf_dir, "events")
    live_from = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("wm")
    )
    return (
        ev.join(F.broadcast(live_from))
        .filter(F.col("ts") > F.col("wm"))
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.date_format("w.start", _FMT).alias("window_start"), "n_events")
    )


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup on event_id (batch analog of streaming
    dropDuplicates + watermark); input replayed twice to prove it."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    return ev.unionByName(ev).dropDuplicates(["event_id"]).select("event_id")


def stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the stream-stream attribution join
    (streaming/jobs.py:stream_stream_attribution_join): purchases ⋈
    same-user views within a 1-hour look-back. The streaming form needs
    the bounded range so state expires; the batch form is the identical
    range-condition join, which makes it SQL-oracle-checkable."""
    from etl_data_pipeline_spark.streaming.jobs import stream_stream_attribution_join

    ev = load_table(spark, sf_dir, "events")
    out = stream_stream_attribution_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.date_format("purchase_ts", _FMT).alias("purchase_ts"),
        "view_id",
        F.date_format("view_ts", _FMT).alias("view_ts"),
    )


# single source of truth for the 30-min session boundary
from etl_data_pipeline_spark.functions.sessions import SESSION_GAP_US  # noqa: E402


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): per-user session ids
    where a >30-min silence starts a new session.

    The classic two-window formulation — lag() to flag session starts,
    then a running sum to number them. Complements session_window
    (stream_session) with the form that lets you JOIN sessions back to
    arbitrary history. Gap compares unix_micros, exact integers in
    both engines. One shuffle (hash by user_id); both windows share
    the same partitioning so the second window is exchange-free.
    """
    from etl_data_pipeline_spark.functions.sessions import with_session_seq

    ev = load_table(spark, sf_dir, "events")
    return with_session_seq(ev, gap_us=SESSION_GAP_US).select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT).alias("ts_str"),
        "session_seq",
    )


def events_conversion_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of streaming/jobs.py:conversion_sessions — the
    gap-OR-purchase sessionizer as a one-pass window query: a session
    boundary opens after a >30-min silence OR after a purchase (so a
    purchase is always its session's LAST event). The trailing open
    session per user is excluded unless purchase-closed, matching the
    streaming operator's emit-on-close semantics exactly.

    Same gaps-and-islands machinery as events_sessionize (lag flag +
    running sum) plus a per-session aggregate; all windows share one
    hash-partition of user_id, so the whole query is ONE shuffle +
    one groupBy on (user, session).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    prev_type = F.lag("event_type").over(w)
    is_start = F.when(
        prev_us.isNull()
        | (F.unix_micros("ts") - prev_us > SESSION_GAP_US)
        | (prev_type == "purchase"),
        1,
    ).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = ev.select(
        "event_id", "user_id", "ts", "event_type",
        F.sum(is_start).over(running).alias("sid"),
    )
    # a purchase FORCES a boundary after itself, so a session contains
    # at most one purchase and it is necessarily the last event:
    # "ends with purchase" == "contains a purchase" (portable bool agg,
    # no cross-engine max_by-with-struct-key surface).
    sessions = tagged.groupBy("user_id", "sid").agg(
        F.min(F.date_format("ts", _FMT)).alias("session_start"),
        F.max(F.date_format("ts", _FMT)).alias("session_end"),
        F.count("*").alias("n_events"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("has_purchase"),
    )
    max_sid = sessions.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    return (
        sessions.join(max_sid, "user_id")
        .filter((F.col("sid") < F.col("max_sid")) | (F.col("has_purchase") == 1))
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            F.when(F.col("has_purchase") == 1, "purchase")
            .otherwise("gap")
            .alias("ended_by"),
        )
    )


QUERIES = {
    "events_conversion_sessions": events_conversion_sessions,
    "events_sessionize": events_sessionize,
    "stream_tumbling": stream_tumbling,
    "stream_sliding": stream_sliding,
    "stream_session": stream_session,
    "stream_watermark_late": stream_watermark_late,
    "stream_dedup": stream_dedup,
    "stream_join_attribution": stream_join_attribution,
}

ORACLE = {
    "events_conversion_sessions": f"""
        WITH tagged AS (
            SELECT event_id, user_id, ts, event_type,
                   sum(CASE WHEN prev_us IS NULL
                             OR epoch_us(ts) - prev_us > {SESSION_GAP_US}
                             OR prev_type = 'purchase'
                        THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM (
                SELECT *,
                       lag(epoch_us(ts)) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_us,
                       lag(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_type
                FROM events
            )
        ), sessions AS (
            SELECT user_id, sid,
                   min(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS session_start,
                   max(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS session_end,
                   count(*) AS n_events,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS has_purchase
            FROM tagged GROUP BY user_id, sid
        ), m AS (
            SELECT user_id, max(sid) AS max_sid FROM sessions GROUP BY user_id
        )
        SELECT s.user_id, s.session_start, s.session_end, s.n_events,
               CASE WHEN s.has_purchase = 1 THEN 'purchase'
                    ELSE 'gap' END AS ended_by
        FROM sessions s JOIN m ON s.user_id = m.user_id
        WHERE s.sid < m.max_sid OR s.has_purchase = 1
    """,
    "events_sessionize": f"""
        WITH lagged AS (
            SELECT event_id, user_id, ts,
                   lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events
        )
        SELECT event_id, user_id,
               strftime(ts, '{_DFMT}') AS ts_str,
               CAST(sum(CASE WHEN prev_us IS NULL
                             OR epoch_us(ts) - prev_us > {SESSION_GAP_US}
                            THEN 1 ELSE 0 END) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_seq
        FROM lagged
    """,
    "stream_tumbling": f"""
        SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
                        '{_DFMT}') AS window_start,
               event_type,
               count(*) AS n_events,
               {sql_round('sum("value")', 2)} AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "stream_sliding": f"""
        SELECT strftime(time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
                        - i * INTERVAL 15 MINUTE, '{_DFMT}') AS window_start,
               count(*) AS n_events
        FROM events CROSS JOIN (SELECT unnest(range(4)) AS i)
        GROUP BY 1
    """,
    "stream_session": f"""
        WITH marked AS (
            SELECT user_id, ts, "value",
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
            SELECT user_id, ts, "value",
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM marked
        )
        SELECT user_id,
               strftime(min(ts), '{_DFMT}') AS session_start,
               count(*) AS n_events,
               {sql_round('sum("value")', 2)} AS sum_value
        FROM sess GROUP BY user_id, sess_id
    """,
    "stream_watermark_late": f"""
        SELECT strftime(time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)),
                        '{_DFMT}') AS window_start,
               count(*) AS n_events
        FROM events
        WHERE ts > (SELECT max(ts) - INTERVAL 10 MINUTE FROM events)
        GROUP BY 1
    """,
    "stream_dedup": "SELECT DISTINCT event_id FROM events",
    "stream_join_attribution": f"""
        SELECT p.event_id AS purchase_id, p.user_id,
               strftime(p.ts, '{_DFMT}') AS purchase_ts,
               v.event_id AS view_id,
               strftime(v.ts, '{_DFMT}') AS view_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts <= p.ts
         AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
}
