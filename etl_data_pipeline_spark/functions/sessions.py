"""Shared gaps-and-islands sessionization.

ONE definition of the session boundary (30-min silence) and ONE
lag-flag + running-sum numbering, consumed by every batch operator
that sessionizes (streaming/batch_analogs.events_sessionize,
operators/analytics.events_session_funnel) — the project already ate
one same-timestamp tie-break divergence between two hand-copied
sessionizers; a single helper makes that class impossible.

Gap comparison is on unix_micros (exact integers in every engine);
ordering ties break by event_id, matching the streaming twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, in exact integer micros


def with_session_seq(
    df: DataFrame,
    gap_us: int = SESSION_GAP_US,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    out_col: str = "session_seq",
) -> DataFrame:
    """Append a 1-based per-user session number: a session starts at
    the user's first event and after every silence > ``gap_us``.

    Both windows hash by ``user_col`` and share one exchange; every
    later per-(user, session) window or groupBy is ALSO exchange-free
    on top of it (user_col alone already co-locates each session)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_us = F.lag(F.unix_micros(ts_col)).over(w)
    is_start = F.when(
        prev_us.isNull() | (F.unix_micros(ts_col) - prev_us > gap_us), 1
    ).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(is_start).over(running))


def sql_session_seq_cte(gap_us: int = SESSION_GAP_US, source: str = "events") -> str:
    """DuckDB rendering of with_session_seq: CTE bodies ``e``/``s``/``t``
    (no WITH keyword); ``t`` carries user_id/event_id/us/event_type/
    session_seq."""
    return f"""e AS (
            SELECT user_id, event_id, epoch_us(ts) AS us, event_type
            FROM {source}
        ), s AS (
            SELECT user_id, event_id, us, event_type,
                   CASE WHEN lag(us) OVER (
                            PARTITION BY user_id ORDER BY us, event_id
                        ) IS NULL
                        OR us - lag(us) OVER (
                            PARTITION BY user_id ORDER BY us, event_id
                        ) > {gap_us} THEN 1 ELSE 0 END AS new_sess
            FROM e
        ), t AS (
            SELECT user_id, event_id, us, event_type,
                   sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_seq
            FROM s
        )"""
