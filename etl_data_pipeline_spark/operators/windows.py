"""Window-function operators (SURVEY.md §2.B "Window functions").

New surface (the reference has no windows). All windows partition by a
key, so at 100 TB the sort is per-partition after a hash exchange on
the partition key — never a global sort. Order keys always include a
unique tiebreaker (o_orderkey / l_linenumber) so results are
deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.session import load_table

# Deterministic per-customer orderings (built lazily — Window specs
# need an active session, so module import must stay session-free).
def _w_cust():
    return Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )


def _w_cust_seq():
    return Window.partitionBy("o_custkey").orderBy(F.asc("o_orderkey"))


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per customer."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(_w_cust()).alias("rn"),
        F.rank().over(_w_cust()).alias("rnk"),
        F.dense_rank().over(_w_cust()).alias("drnk"),
    )


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer in orderkey sequence (ROWS frame)."""
    orders = load_table(spark, sf_dir, "orders")
    running = F.sum("o_totalprice").over(
        _w_cust_seq().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        hround(running, 2).alias("running_total"),
    )


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead across each customer's order sequence."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        hround(F.lag("o_totalprice", 1).over(_w_cust_seq()), 2).alias("prev_price"),
        hround(F.lead("o_totalprice", 1).over(_w_cust_seq()), 2).alias("next_price"),
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: sum of quantity within 5 quantity-units below each
    row's quantity, per returnflag. RANGE frames depend only on the
    order-key value, so ties are well-defined (deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity").rangeBetween(-5, 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        hround(F.sum("l_quantity").over(w), 2).alias("qty_in_band"),
    )


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics per customer ordering: ntile quartiles,
    percent_rank, cume_dist — completes the window-function family."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(_w_cust()).alias("quartile"),
        hround(F.percent_rank().over(_w_cust()), 6).alias("pct_rank"),
        hround(F.cume_dist().over(_w_cust()), 6).alias("cume"),
    )


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value across each customer's
    order-date sequence (full-partition ROWS frame: last_value's
    default frame stops at CURRENT ROW, which is almost never what an
    analyst means — pin it to the whole partition)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        hround(F.first("o_totalprice").over(full), 2).alias("first_price"),
        hround(F.last("o_totalprice").over(full), 2).alias("last_price"),
        hround(F.nth_value("o_totalprice", 2).over(full), 2).alias("second_price"),
    )


TRAILING_DAYS = 7


def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: each order's trailing-7-day revenue
    for its customer (the moving-window-over-event-time analytic).

    Ordered on epoch seconds with a numeric range bound — the
    engine-portable spelling of RANGE BETWEEN INTERVAL 7 DAYS
    PRECEDING; value-based frames are tie-safe (same instant ⇒ same
    frame), unlike ROWS."""
    orders = load_table(spark, sf_dir, "orders")
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-TRAILING_DAYS * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        hround(F.sum("o_totalprice").over(w), 2).alias("trailing_7d_revenue"),
        F.count("*").over(w).alias("trailing_7d_orders"),
    )


QUERIES = {
    "window_rank": window_rank,
    "window_time_range": window_time_range,
    "window_first_last": window_first_last,
    "window_running": window_running,
    "window_lag_lead": window_lag_lead,
    "window_range_frame": window_range_frame,
    "window_distribution": window_distribution,
}

ORACLE = {
    "window_time_range": f"""
        SELECT o_custkey, o_orderkey, o_totalprice,
               {sql_round('sum(o_totalprice) OVER w', 2)} AS trailing_7d_revenue,
               count(*) OVER w AS trailing_7d_orders
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY epoch(o_orderdate::TIMESTAMP)
                     RANGE BETWEEN {TRAILING_DAYS * 86400} PRECEDING
                           AND CURRENT ROW)
    """,
    "window_first_last": f"""
        SELECT o_custkey, o_orderkey, o_totalprice,
               {sql_round('first_value(o_totalprice) OVER w', 2)} AS first_price,
               {sql_round('last_value(o_totalprice) OVER w', 2)} AS last_price,
               {sql_round('nth_value(o_totalprice, 2) OVER w', 2)} AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "window_distribution": f"""
        SELECT o_custkey, o_orderkey, o_totalprice,
               ntile(4) OVER w AS quartile,
               {sql_round('percent_rank() OVER w', 6)} AS pct_rank,
               {sql_round('cume_dist() OVER w', 6)} AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    "window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER w AS rn,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    "window_running": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               floor((sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100
                   AS running_total
        FROM orders
    """,
    "window_lag_lead": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               floor((lag(o_totalprice, 1) OVER w) * 100 + 0.5) / 100 AS prev_price,
               floor((lead(o_totalprice, 1) OVER w) * 100 + 0.5) / 100 AS next_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC)
    """,
    "window_range_frame": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
               floor((sum(l_quantity) OVER (
                   PARTITION BY l_returnflag ORDER BY l_quantity
                   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100
                   AS qty_in_band
        FROM lineitem
    """,
}
