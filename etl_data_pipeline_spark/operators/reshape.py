"""Reshape operators: pivot (long→wide) and unpivot/melt (wide→long).

New surface (the reference has no reshaping — SURVEY.md §2.B negative
space). Scale posture:
- pivot with an EXPLICIT value list compiles to one hash aggregate
  (no extra pass to discover pivot values, which at 100 TB would be a
  full scan + collect to the driver — always pass the list);
- unpivot is a per-row expression (stack), no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.session import load_table

ORDER_STATUSES = ["O", "F", "P"]


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per priority, pivoted wide by order status.

    Explicit pivot values (see module docstring); absent cells are 0,
    not NULL, so the wide table is directly usable downstream.
    """
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"cnt_{s}")
            for s in ORDER_STATUSES
        ],
    )


UNPIVOT_METRICS = ["sum_qty", "sum_price", "avg_disc"]


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag lineitem aggregates melted to (key, metric,
    value) long form — the inverse reshape, via DataFrame.unpivot."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        hround(F.sum("l_quantity"), 2).alias("sum_qty"),
        hround(F.sum("l_extendedprice"), 2).alias("sum_price"),
        hround(F.avg("l_discount"), 6).alias("avg_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=UNPIVOT_METRICS,
        variableColumnName="metric",
        valueColumnName="value",
    )


QUERIES = {
    "agg_pivot": agg_pivot,
    "unpivot_metrics": unpivot_metrics,
}

ORACLE = {
    "agg_pivot": """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_O,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_F,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_P
        FROM orders GROUP BY o_orderpriority
    """,
    "unpivot_metrics": f"""
        WITH wide AS (
            SELECT l_returnflag,
                   {sql_round('sum(l_quantity)', 2)} AS sum_qty,
                   {sql_round('sum(l_extendedprice)', 2)} AS sum_price,
                   {sql_round('avg(l_discount)', 6)} AS avg_disc
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM wide
        UNION ALL
        SELECT l_returnflag, 'avg_disc', avg_disc FROM wide
    """,
}
